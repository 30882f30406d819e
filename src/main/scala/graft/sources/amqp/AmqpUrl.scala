package graft.sources.amqp

/** AMQP connection URL in the shape pika's `URLParameters` accepts —
  * the reference's entire connection config surface (reference
  * amqp.py:41 `pika.BlockingConnection(pika.URLParameters(self.url))`,
  * docs/usage.rst examples):
  *
  * {{{
  *   amqp[s]://[user[:password]@]host[:port][/vhost][?k=v&...]
  * }}}
  *
  * Defaults mirror pika's: guest/guest, port 5672 (5671 for amqps),
  * vhost "/". The vhost is the URL path with its leading slash
  * stripped, percent-decoded — so `/%2F` names the default vhost "/"
  * and an empty path means the default too.
  *
  * The query string carries pika `URLParameters` connection options.
  * Honored here: `heartbeat` (None ⇒ accept the broker's tune value,
  * pika's default), `connection_attempts`, `retry_delay`,
  * `socket_timeout` (connect timeout), `frame_max`, `channel_max`,
  * `locale`, and `ssl_options` — a dict literal (pika's shape, e.g.
  * `{'ca_certs': '/ca.pem', 'certfile': ..., 'keyfile': ...,
  * 'server_hostname': ...}`) whose keys map onto the JVM TLS context
  * ([[Tls.context]]): ca_certs → trust store, certfile/keyfile →
  * key store (mutual TLS), server_hostname → SNI/verification name.
  * Also honored: `client_properties` — a dict literal of extra
  * properties merged over the client defaults and sent as the AMQP
  * field table in connection.start-ok (pika URLParameters semantics:
  * user entries win on key collision); and `tcp_options` — a dict of
  * socket options mapped onto the JVM equivalents (`TCP_KEEPIDLE`/
  * `TCP_KEEPINTVL`/`TCP_KEEPCNT` → `jdk.net.ExtendedSocketOptions`,
  * `SO_KEEPALIVE` → `StandardSocketOptions`; any keepalive tuning key
  * implies SO_KEEPALIVE on, since the tuning is inert without it).
  *
  * Unknown keys raise, exactly as pika's
  * `ValueError("Unknown URL parameter")`; the pika keys this client
  * has no machinery for (`blocked_connection_timeout`,
  * `stack_timeout`, `tcp_options` sub-keys like TCP_USER_TIMEOUT with
  * no JVM socket option, and unsupported ssl_options sub-keys) raise
  * a distinct "not supported" error rather than being silently
  * dropped.
  */
final case class AmqpUrl(host: String, port: Int, user: String,
    password: String, vhost: String, tls: Boolean,
    heartbeat: Option[Int] = None, connectionAttempts: Int = 1,
    retryDelay: Double = 2.0, socketTimeout: Double = 10.0,
    frameMax: Int = 0, channelMax: Int = 0, locale: String = "en_US",
    sslOptions: Option[SslOptions] = None,
    clientProperties: Map[String, Any] = Map.empty,
    tcpOptions: Map[String, Int] = Map.empty,
    blockedConnectionTimeout: Option[Double] = None,
    stackTimeout: Option[Double] = None)

/** Parsed pika `ssl_options` dict — only keys with a JVM-native
  * equivalent; the rest are rejected at parse time.
  */
final case class SslOptions(caCerts: Option[String] = None,
    certFile: Option[String] = None, keyFile: Option[String] = None,
    serverHostname: Option[String] = None)

object AmqpUrl {
  /** pika keys that exist but this client cannot honor — rejected
    * loudly (a silently-ignored TLS option would be a security bug).
    * Empty as of round 14: `stack_timeout` (the last holdout, once
    * thought ioloop-internal) is honored as an overall bring-up
    * deadline in [[AmqpClient]]; every key pika's URLParameters
    * accepts is now honored.
    */
  private val Unsupported = Set.empty[String]

  /** tcp_options keys with a JVM socket-option equivalent. */
  private val TcpOptionKeys =
    Set("TCP_KEEPIDLE", "TCP_KEEPINTVL", "TCP_KEEPCNT", "SO_KEEPALIVE")

  def parse(url: String): AmqpUrl = {
    val u = new java.net.URI(url)
    val tls = u.getScheme match {
      case "amqp"  => false
      case "amqps" => true
      case s => throw new IllegalArgumentException(
        s"unsupported scheme '$s' in broker url '$url' (expected amqp or amqps)")
    }
    val host = Option(u.getHost).getOrElse("localhost")
    val port = if (u.getPort > 0) u.getPort else if (tls) 5671 else 5672
    // java.net.URI percent-decodes userInfo and path (and, unlike
    // URLDecoder, does not map '+' to space — matching pika's unquote)
    val (user, password) = Option(u.getUserInfo) match {
      case Some(ui) =>
        val i = ui.indexOf(':')
        if (i < 0) (ui, "guest") else (ui.take(i), ui.drop(i + 1))
      case None => ("guest", "guest")
    }
    val vhost = Option(u.getPath)
      .filter(_.nonEmpty)
      .map(_.substring(1))
      .filter(_.nonEmpty)
      .getOrElse("/")
    val base = AmqpUrl(host, port, user, password, vhost, tls)
    Option(u.getRawQuery).filter(_.nonEmpty).map(_.split("&").toSeq)
      .getOrElse(Seq.empty)
      .filter(_.nonEmpty)
      .foldLeft(base) { (acc, kv) =>
        val i = kv.indexOf('=')
        val (k, v) =
          if (i < 0) (decode(kv), "")
          else (decode(kv.take(i)), decode(kv.drop(i + 1)))
        applyParam(acc, k, v, url)
      }
  }

  /** Percent-decode like pika's `unquote`: '+' stays '+'. */
  private def decode(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")

  private def int(k: String, v: String, min: Int, max: Int): Int = {
    val n = try v.toInt catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"URL parameter $k: '$v' is not an integer") }
    if (n < min || n > max) throw new IllegalArgumentException(
      s"URL parameter $k=$n out of range [$min, $max]")
    n
  }

  private def num(k: String, v: String): Double =
    try v.toDouble catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"URL parameter $k: '$v' is not a number") }

  private def applyParam(a: AmqpUrl, k: String, v: String, url: String): AmqpUrl =
    k match {
      // 0 disables heartbeats; AMQP carries it as a short
      case "heartbeat" => a.copy(heartbeat = Some(int(k, v, 0, 65535)))
      case "connection_attempts" => a.copy(connectionAttempts = int(k, v, 1, Int.MaxValue))
      case "retry_delay" => a.copy(retryDelay = num(k, v))
      case "socket_timeout" => a.copy(socketTimeout = num(k, v))
      // pika arms this off the broker's connection.blocked frame
      // (AMQP 0-9-1 extension): past the timeout the connection is
      // torn down with ConnectionBlockedTimeout
      case "blocked_connection_timeout" =>
        a.copy(blockedConnectionTimeout = Some(num(k, v)))
      // pika Parameters.stack_timeout: overall deadline for the FULL
      // protocol-stack bring-up (TCP + TLS + AMQP handshake)
      case "stack_timeout" => a.copy(stackTimeout = Some(num(k, v)))
      // AMQP 0-9-1 frame-min-size .. pika's default max
      case "frame_max" => a.copy(frameMax = int(k, v, 4096, Amqp.DefaultFrameMax))
      case "channel_max" => a.copy(channelMax = int(k, v, 0, 65535))
      case "locale" => a.copy(locale = v)
      case "ssl_options" => a.copy(sslOptions = Some(parseSsl(v, url)))
      case "client_properties" =>
        a.copy(clientProperties = parseDict(v, url, "client_properties"))
      case "tcp_options" =>
        val d = parseDict(v, url, "tcp_options").map {
          case (k, _) if !TcpOptionKeys(k) =>
            throw new IllegalArgumentException(
              s"tcp_options key '$k' in '$url' is recognized by pika but has no JVM socket-option equivalent")
          case (k, i: Int) => k -> i
          case (k, b: Boolean) => k -> (if (b) 1 else 0)
          case (k, other) => throw new IllegalArgumentException(
            s"tcp_options value for '$k' in '$url' must be an integer, got '$other'")
        }
        a.copy(tcpOptions = d)
      case key if Unsupported(key) => throw new IllegalArgumentException(
        s"URL parameter '$key' in '$url' is recognized by pika but not supported by this client")
      case key => throw new IllegalArgumentException(
        s"Unknown URL parameter: '$key' in '$url'")
    }

  /** Parse a flat Python-ish dict literal (the pika URLParameters
    * query-string shape, e.g. `{'product': 'svc', 'attempts': 3,
    * 'beta': true}`) into typed values: quoted → String, true/false
    * (any case) → Boolean, integral → Int (Long when out of Int
    * range), decimal → Double. Nested dicts raise — pika accepts them
    * for client_properties but the URL surface the reference exposes
    * never uses one, and silently flattening would corrupt the table.
    */
  private[amqp] def parseDict(v: String, url: String,
      what: String): Map[String, Any] = {
    val body = v.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) Map.empty
    else body.split(",").map { kv =>
      val i = kv.indexOf(':')
      if (i <= 0) throw new IllegalArgumentException(
        s"$what entry '$kv' in '$url' is not a key: value pair")
      val k = unquote(kv.take(i))
      val raw = kv.drop(i + 1).trim
      if (raw.startsWith("{")) throw new IllegalArgumentException(
        s"$what value for '$k' in '$url': nested dicts are not supported")
      val value: Any =
        if ((raw.startsWith("'") && raw.endsWith("'")) ||
            (raw.startsWith("\"") && raw.endsWith("\""))) unquote(raw)
        else if (raw.equalsIgnoreCase("true")) true
        else if (raw.equalsIgnoreCase("false")) false
        else raw.toIntOption.getOrElse(
          raw.toLongOption.getOrElse(
            raw.toDoubleOption.getOrElse(raw)))
      k -> value
    }.toMap
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if ((t.startsWith("'") && t.endsWith("'")) ||
        (t.startsWith("\"") && t.endsWith("\"")))
      t.substring(1, t.length - 1)
    else t
  }

  /** Parse pika's ssl_options dict literal (single- or double-quoted
    * keys/values). Keys without a JVM equivalent raise — honoring a
    * subset silently would be the security bug the old blanket
    * rejection guarded against.
    */
  private def parseSsl(v: String, url: String): SslOptions = {
    val body = v.trim.stripPrefix("{").stripSuffix("}").trim
    def unq(s: String): String = {
      val t = s.trim
      if ((t.startsWith("'") && t.endsWith("'")) ||
          (t.startsWith("\"") && t.endsWith("\"")))
        t.substring(1, t.length - 1)
      else t
    }
    val opts =
      if (body.isEmpty) SslOptions()
      else body.split(",").foldLeft(SslOptions()) { (acc, kv) =>
        val i = kv.indexOf(':')
        if (i <= 0) throw new IllegalArgumentException(
          s"ssl_options entry '$kv' in '$url' is not a key: value pair")
        val (k, value) = (unq(kv.take(i)), unq(kv.drop(i + 1)))
        k match {
          case "ca_certs" | "cafile" => acc.copy(caCerts = Some(value))
          case "certfile" => acc.copy(certFile = Some(value))
          case "keyfile" => acc.copy(keyFile = Some(value))
          case "server_hostname" =>
            acc.copy(serverHostname = Some(value))
          case other => throw new IllegalArgumentException(
            s"ssl_options key '$other' in '$url' is recognized by pika but not supported by this client")
        }
      }
    if (opts.certFile.isDefined != opts.keyFile.isDefined)
      throw new IllegalArgumentException(
        s"ssl_options in '$url': certfile and keyfile must be given together")
    opts
  }
}
