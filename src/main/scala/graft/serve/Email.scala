package graft.serve

import java.nio.charset.StandardCharsets

/** Std.System.Email (reference `ecllibrary/std/system/Email.ecl`:
  * SendEmail / SendEmailAttachText / SendEmailAttachData; SMTP client
  * `common/remote/rmtsmtp.cpp`): RFC 5322 + MIME message assembly and the
  * SMTP dialogue, over a pluggable transport — the Soapcall pattern. The
  * assembly functions are PURE so the envelope bytes are spec-pinnable;
  * the default transport is a real TCP client (specs drive it against an
  * in-process loopback SMTP listener; production points at the cluster's
  * relay host).
  *
  * Reference contracts kept: To/Cc/Bcc recipient semantics (bcc gets a
  * RCPT TO but NO header — rmtsmtp.cpp:634 "Do not append bcc"),
  * high-priority as `X-Priority: 1` + `Importance: high` (:640), header
  * order From/To/Cc/Subject/priority/MIME-Version (:630-643), text parts
  * quoted-printable only when needed (:820 CTextMailPart), data parts
  * base64 (:838), multipart/mixed with an explicit boundary and
  * `--boundary` framing (:868-886), and the
  * HELO→MAIL FROM→RCPT TO→DATA→.→QUIT dialogue (:900-957).
  */
object Email {

  final case class SmtpConfig(
      mailServer: String,
      port: Int = 25,
      sender: String,
      heloDomain: String = "graft")

  // ---- MIME assembly (pure functions → byte-pinnable in specs) -----------

  /** Quoted-printable per RFC 2045 §6.7 over the Latin-1 bytes of `text`
    * (the reference's mailEncode, rmtsmtp.cpp:360): printable US-ASCII
    * passes through; `=`, controls, 8-bit bytes escape as `=XX`; `-` at
    * line start before another `-` escapes to protect multipart boundaries
    * (RFC 1341 §7.2.1); trailing space/tab escapes; any newline flavor
    * becomes CRLF; lines soft-break at 76 with `=\r\n`. Returns
    * (encoded, neededEncoding) — a pure-ASCII single-line body reports
    * false and is sent 7bit, like the reference.
    */
  def quotedPrintable(text: String): (String, Boolean) = {
    val out = new StringBuilder
    var lineLen = 0
    var esc = false
    def softBreakFor(width: Int): Unit =
      if (lineLen + width > 76) { out.append("=\r\n"); lineLen = 0; esc = true }
    def escape(b: Int): Unit = {
      softBreakFor(3)
      out.append(f"=${b & 0xff}%02X")
      lineLen += 3
      esc = true
    }
    val bytes = text.getBytes(StandardCharsets.ISO_8859_1)
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xff
      val next = if (i + 1 < bytes.length) bytes(i + 1) & 0xff else -1
      if (c == '\r' || c == '\n') {
        out.append("\r\n"); lineLen = 0; esc = true
        if (c == '\r' && next == '\n') i += 1
      } else if (c == ' ' || c == '\t') {
        // spaces keep only mid-line; at EOL they must be escaped (RFC 2045
        // §6.7 rule 3)
        if (next == -1 || next == '\r' || next == '\n') escape(c)
        else { softBreakFor(1); out.append(c.toChar); lineLen += 1 }
      } else if (c == '-' && lineLen == 0 && next == '-') {
        escape(c) // protect a "--" at line start from boundary collision
      } else if (c >= 33 && c <= 126 && c != '=') {
        softBreakFor(1); out.append(c.toChar); lineLen += 1
      } else escape(c)
      i += 1
    }
    (out.toString, esc)
  }

  /** RFC 2045 §6.8 base64, folded at 76 columns with CRLF. */
  def base64Lines(bytes: Array[Byte]): String =
    java.util.Base64.getMimeEncoder(76, Array('\r'.toByte, '\n'.toByte))
      .encodeToString(bytes)

  /** One MIME part: its own headers (Content-Type / Content-Disposition /
    * optional Content-Transfer-Encoding, the reference's CMailPart header
    * order) plus the encoded content.
    */
  final case class Part(headers: String, content: String)

  private def partHeaders(mimeType: String, filename: Option[String],
      encoding: Option[String]): String = {
    require(!mimeType.exists(c => c == '\r' || c == '\n'),
      "illegal mime type")
    filename.foreach(f => require(!f.exists(c => c == '\r' || c == '\n' ||
      c == '"'), "illegal attachment filename"))
    val disposition = filename
      .map(f => s"""attachment; filename="$f"""").getOrElse("inline")
    s"Content-Type: $mimeType\r\n" +
      s"Content-Disposition: $disposition\r\n" +
      encoding.map(e => s"Content-Transfer-Encoding: $e\r\n").getOrElse("")
  }

  /** Text part: quoted-printable iff the content needs it. */
  def textPart(body: String,
      mimeType: String = "text/plain; charset=ISO-8859-1",
      filename: Option[String] = None): Part = {
    val (encoded, needed) = quotedPrintable(body)
    Part(partHeaders(mimeType, filename,
      if (needed) Some("quoted-printable") else None), encoded)
  }

  /** Binary part: always base64. */
  def dataPart(bytes: Array[Byte], mimeType: String, filename: String): Part =
    Part(partHeaders(mimeType, Some(filename), Some("base64")),
      base64Lines(bytes))

  /** multipart/mixed wrapping body + attachment. The boundary is random
    * per message (the reference draws 12 random bytes); pass one
    * explicitly for deterministic bytes.
    */
  def multipart(inline: Part, attachment: Part,
      boundary: String = defaultBoundary()): Part = {
    def one(p: Part): String =
      s"\r\n--$boundary\r\n${p.headers}\r\n${p.content}"
    Part(partHeaders(s"""multipart/mixed; boundary="$boundary"""", None, None),
      one(inline) + one(attachment) + s"\r\n--$boundary--\r\n")
  }

  private def defaultBoundary(): String = {
    val b = new Array[Byte](12)
    new java.security.SecureRandom().nextBytes(b)
    java.util.Base64.getEncoder.encodeToString(b)
  }

  private def checkHeaderValue(v: String, what: String): String = {
    require(!v.exists(c => c == '\r' || c == '\n'),
      s"illegal $what: header injection")
    v
  }

  /** The full DATA payload: RFC 5322 headers in the reference's order
    * (From, To, Cc when present, Subject, priority pair when high,
    * MIME-Version), then the part's own headers, a blank line, and the
    * encoded content. Bcc never appears — blind means envelope-only.
    */
  def message(sender: String, to: String, cc: String, subject: String,
      highPriority: Boolean, part: Part): String = {
    val sb = new StringBuilder
    sb.append("From: ").append(checkHeaderValue(sender, "sender")).append("\r\n")
    sb.append("To: ").append(checkHeaderValue(to, "to list")).append("\r\n")
    if (cc.nonEmpty)
      sb.append("Cc: ").append(checkHeaderValue(cc, "cc list")).append("\r\n")
    sb.append("Subject: ").append(checkHeaderValue(subject, "subject"))
      .append("\r\n")
    if (highPriority)
      sb.append("X-Priority: 1\r\nImportance: high\r\n")
    sb.append("MIME-Version: 1.0\r\n")
    sb.append(part.headers)
    sb.append("\r\n")
    sb.append(part.content)
    sb.toString
  }

  /** The SMTP dialogue as (command, expected reply code) pairs — the
    * doSendEmail sequence (rmtsmtp.cpp:900): HELO, MAIL FROM, one RCPT TO
    * per recipient (to + cc + bcc), DATA, the dot-stuffed payload ending
    * in CRLF.CRLF, QUIT.
    */
  def dialogue(cfg: SmtpConfig, recipients: Seq[String],
      payload: String): Seq[(String, Int)] = {
    val stuffed = payload.replace("\r\n.", "\r\n..") // RFC 5321 §4.5.2
    Seq(s"HELO ${cfg.heloDomain}\r\n" -> 250,
      s"MAIL FROM:<${cfg.sender}>\r\n" -> 250) ++
      recipients.map(r => s"RCPT TO:<$r>\r\n" -> 250) ++
      Seq("DATA\r\n" -> 354, stuffed + "\r\n.\r\n" -> 250, "QUIT\r\n" -> 221)
  }

  private def splitAddrs(s: String): Seq[String] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  /** Transport: run the dialogue against (host, port), throwing on any
    * unexpected reply. Pluggable for tests; [[socketTransport]] is real.
    */
  type Transport = (String, Int, Seq[(String, Int)]) => Unit

  /** A real SMTP client on a TCP socket: reads the 220 greeting, then
    * writes each command and checks the reply's 3-digit code (multi-line
    * replies per RFC 5321 §4.2.1 — lines `250-…` continue, `250 …` ends).
    */
  def socketTransport(connectTimeoutMs: Int = 5000,
      readTimeoutMs: Int = 25000): Transport = (host, port, cmds) => {
    val sock = new java.net.Socket()
    try {
      sock.connect(new java.net.InetSocketAddress(host, port), connectTimeoutMs)
      sock.setSoTimeout(readTimeoutMs)
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        sock.getInputStream, StandardCharsets.ISO_8859_1))
      val out = sock.getOutputStream
      def readReply(): Int = {
        var line = in.readLine()
        if (line == null) throw new java.io.IOException("SMTP peer closed")
        while (line.length >= 4 && line.charAt(3) == '-') line = in.readLine()
        line.take(3).toInt
      }
      val greeting = readReply()
      if (greeting != 220)
        throw new java.io.IOException(s"SMTP greeting $greeting")
      cmds.foreach { case (cmd, expect) =>
        out.write(cmd.getBytes(StandardCharsets.ISO_8859_1))
        out.flush()
        val code = readReply()
        if (code != expect) throw new java.io.IOException(
          s"SMTP ${cmd.takeWhile(_ != '\r').take(40)} → $code (want $expect)")
      }
    } finally sock.close()
  }

  private def send(cfg: SmtpConfig, to: String, cc: String, bcc: String,
      subject: String, highPriority: Boolean, part: Part,
      rptErrAsFail: Boolean, transport: Transport): Boolean = {
    val rcpts = splitAddrs(to) ++ splitAddrs(cc) ++ splitAddrs(bcc)
    require(rcpts.nonEmpty, "no recipients")
    rcpts.foreach(r => require(!r.exists(c => c == '\r' || c == '\n' ||
      c == '<' || c == '>'), s"illegal recipient: '$r'"))
    val payload = message(cfg.sender, to, cc, subject, highPriority, part)
    try {
      transport(cfg.mailServer, cfg.port, dialogue(cfg, rcpts, payload))
      true
    } catch {
      // rptErrAsFail=false: a mail failure must not fail the job — the
      // reference downgrades to a workunit warning (doSendEmail catch)
      case _: Exception if !rptErrAsFail => false
    }
  }

  /** SendEmail (Email.ecl:25). */
  def sendEmail(cfg: SmtpConfig, to: String, subject: String, body: String,
      cc: String = "", bcc: String = "", highPriority: Boolean = false,
      rptErrAsFail: Boolean = true,
      transport: Transport = socketTransport()): Boolean =
    send(cfg, to, cc, bcc, subject, highPriority, textPart(body),
      rptErrAsFail, transport)

  /** SendEmailAttachText (Email.ecl:44): body + a text attachment. */
  def sendEmailAttachText(cfg: SmtpConfig, to: String, subject: String,
      body: String, attachment: String, mimeType: String,
      attachmentName: String, cc: String = "", bcc: String = "",
      highPriority: Boolean = false, rptErrAsFail: Boolean = true,
      boundary: Option[String] = None,
      transport: Transport = socketTransport()): Boolean =
    send(cfg, to, cc, bcc, subject, highPriority,
      multipart(textPart(body),
        textPart(attachment, mimeType, Some(attachmentName)),
        boundary.getOrElse(defaultBoundary())),
      rptErrAsFail, transport)

  /** SendEmailAttachData (Email.ecl:66): body + a binary attachment. */
  def sendEmailAttachData(cfg: SmtpConfig, to: String, subject: String,
      body: String, attachment: Array[Byte], mimeType: String,
      attachmentName: String, cc: String = "", bcc: String = "",
      highPriority: Boolean = false, rptErrAsFail: Boolean = true,
      boundary: Option[String] = None,
      transport: Transport = socketTransport()): Boolean =
    send(cfg, to, cc, bcc, subject, highPriority,
      multipart(textPart(body),
        dataPart(attachment, mimeType, attachmentName),
        boundary.getOrElse(defaultBoundary())),
      rptErrAsFail, transport)
}
