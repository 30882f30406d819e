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
  * `locale`. Unknown keys raise, exactly as pika's
  * `ValueError("Unknown URL parameter")`; the pika keys this client
  * has no machinery for (`ssl_options`, `tcp_options`,
  * `client_properties`, `blocked_connection_timeout`,
  * `stack_timeout`) raise a distinct "not supported" error rather
  * than being silently dropped.
  */
final case class AmqpUrl(host: String, port: Int, user: String,
    password: String, vhost: String, tls: Boolean,
    heartbeat: Option[Int] = None, connectionAttempts: Int = 1,
    retryDelay: Double = 2.0, socketTimeout: Double = 10.0,
    frameMax: Int = 0, channelMax: Int = 0, locale: String = "en_US")

object AmqpUrl {
  /** pika keys that exist but this client cannot honor — rejected
    * loudly (a silently-ignored TLS option would be a security bug).
    */
  private val Unsupported = Set("ssl_options", "tcp_options",
    "client_properties", "blocked_connection_timeout", "stack_timeout")

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
      // AMQP 0-9-1 frame-min-size .. pika's default max
      case "frame_max" => a.copy(frameMax = int(k, v, 4096, Amqp.DefaultFrameMax))
      case "channel_max" => a.copy(channelMax = int(k, v, 0, 65535))
      case "locale" => a.copy(locale = v)
      case key if Unsupported(key) => throw new IllegalArgumentException(
        s"URL parameter '$key' in '$url' is recognized by pika but not supported by this client")
      case key => throw new IllegalArgumentException(
        s"Unknown URL parameter: '$key' in '$url'")
    }
}
