package graft.sources.amqp

import java.security.{KeyFactory, KeyStore, PrivateKey}
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec

import javax.net.ssl.{KeyManager, KeyManagerFactory, SSLContext, TrustManager, TrustManagerFactory}

/** TLS material loading for the pika `ssl_options` URL parameter
  * (reference amqp.py:40-41 accepts any pika `URLParameters` key;
  * pika's SSLOptions carries PEM paths). Everything here is
  * JDK-native: `ca_certs` PEM certificates become an in-memory trust
  * store, `certfile`/`keyfile` (PEM chain + unencrypted PKCS#8 key)
  * become an in-memory key store for mutual TLS. No option is ever
  * silently dropped — what can't be honored raises at parse time in
  * [[AmqpUrl]].
  */
object Tls {

  private val PemBlock =
    "-----BEGIN ([A-Z ]+)-----([A-Za-z0-9+/=\\s]+)-----END \\1-----".r

  private def pemBlocks(path: String, kind: String): Seq[Array[Byte]] = {
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8")
    val blocks = PemBlock.findAllMatchIn(txt)
      .filter(_.group(1) == kind)
      .map(m => java.util.Base64.getMimeDecoder.decode(m.group(2)))
      .toSeq
    require(blocks.nonEmpty, s"no '$kind' PEM block found in $path")
    blocks
  }

  /** All CERTIFICATE blocks of a PEM file, in order. */
  def readCerts(path: String): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    pemBlocks(path, "CERTIFICATE").map(der =>
      cf.generateCertificate(new java.io.ByteArrayInputStream(der))
        .asInstanceOf[X509Certificate])
  }

  /** An unencrypted PKCS#8 `PRIVATE KEY` PEM (RSA or EC). */
  def readPkcs8Key(path: String): PrivateKey = {
    val der = pemBlocks(path, "PRIVATE KEY").head
    val spec = new PKCS8EncodedKeySpec(der)
    Seq("RSA", "EC", "Ed25519").view
      .flatMap { alg =>
        try Some(KeyFactory.getInstance(alg).generatePrivate(spec))
        catch { case _: java.security.spec.InvalidKeySpecException => None }
      }
      .headOption
      .getOrElse(throw new IllegalArgumentException(
        s"$path holds a PKCS#8 key of an unsupported algorithm"))
  }

  private def emptyKeyStore(): KeyStore = {
    val ks = KeyStore.getInstance(KeyStore.getDefaultType)
    ks.load(null, null)
    ks
  }

  /** SSLContext honoring the parsed `ssl_options`: ca_certs → trust
    * managers, certfile+keyfile → key managers; both absent → the
    * JVM default context (pika's no-ssl_options amqps behavior).
    */
  def context(opts: SslOptions): SSLContext = {
    val tms: Array[TrustManager] = opts.caCerts.map { p =>
      val ks = emptyKeyStore()
      readCerts(p).zipWithIndex.foreach { case (c, i) =>
        ks.setCertificateEntry(s"ca$i", c) }
      val tmf = TrustManagerFactory.getInstance(
        TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ks)
      tmf.getTrustManagers
    }.orNull
    val kms: Array[KeyManager] = (opts.certFile, opts.keyFile) match {
      case (Some(cf), Some(kf)) =>
        val ks = emptyKeyStore()
        ks.setKeyEntry("client", readPkcs8Key(kf), Array.empty[Char],
          readCerts(cf).toArray)
        val kmf = KeyManagerFactory.getInstance(
          KeyManagerFactory.getDefaultAlgorithm)
        kmf.init(ks, Array.empty[Char])
        kmf.getKeyManagers
      case (None, None) => null
      case _ => throw new IllegalArgumentException(
        "ssl_options certfile and keyfile must be given together")
    }
    if (tms == null && kms == null) SSLContext.getDefault
    else {
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(kms, tms, null)
      ctx
    }
  }
}
