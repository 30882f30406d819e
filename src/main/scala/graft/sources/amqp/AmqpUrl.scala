package graft.sources.amqp

/** AMQP connection URL in the shape pika's `URLParameters` accepts —
  * the reference's entire connection config surface (reference
  * amqp.py:41 `pika.BlockingConnection(pika.URLParameters(self.url))`,
  * docs/usage.rst examples):
  *
  * {{{
  *   amqp[s]://[user[:password]@]host[:port][/vhost]
  * }}}
  *
  * Defaults mirror pika's: guest/guest, port 5672 (5671 for amqps),
  * vhost "/". The vhost is the URL path with its leading slash
  * stripped, percent-decoded — so `/%2F` names the default vhost "/"
  * and an empty path means the default too.
  */
final case class AmqpUrl(host: String, port: Int, user: String,
    password: String, vhost: String, tls: Boolean)

object AmqpUrl {
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
    AmqpUrl(host, port, user, password, vhost, tls)
  }
}
