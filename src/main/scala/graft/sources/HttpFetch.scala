package graft.sources

/** Executor-side HTTP GET for [[Readers.httpFetchJson]] /
  * [[Readers.httpFetchCsv]] — deliberately java.net.HttpURLConnection
  * (JDK-only, serializable-free static call) so fetch tasks need no
  * extra dependency and no driver round trip. Follows same-protocol
  * redirects, fails loudly on any non-2xx status (a silent empty page
  * would truncate an ingestion window), and reads the body fully so
  * connections return to the JVM's keep-alive pool.
  *
  * Gzip: the reference's first backfill window is a `.gz` CSV pull
  * decompressed client-side (nyc_ingestion_dag.py:71 fetches
  * `listings.csv.gz`; :105-107 is pandas `compression="gzip"`), and
  * HttpURLConnection does NOT auto-decompress — so `get` decompresses
  * transparently when the response says `Content-Encoding: gzip` OR
  * the URL path ends `.gz` (a pre-compressed artifact served without
  * the header, the common static-bucket shape). Both paths verify the
  * 0x1f 0x8b magic before inflating: a `.gz`-named body that is
  * actually plain text passes through untouched, and a body that
  * CLAIMS gzip but isn't fails loudly rather than returning garbage.
  */
private[sources] object HttpFetch {
  def get(url: String, headers: Map[String, String],
      connectTimeoutMs: Int, readTimeoutMs: Int,
      accept: String = "application/json"): String = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestProperty("Accept", accept)
      // advertise gzip explicitly: we inflate below, and wire-side
      // compression is pure win for 100 TB-scale backfill windows
      conn.setRequestProperty("Accept-Encoding", "gzip, identity")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"HTTP $code fetching $url")
      val raw = {
        val in = conn.getInputStream
        try in.readAllBytes() finally in.close()
      }
      val declared = Option(conn.getContentEncoding)
        .exists(_.toLowerCase(java.util.Locale.ROOT).contains("gzip"))
      val gzPath = new java.net.URI(url).getPath != null &&
        new java.net.URI(url).getPath.endsWith(".gz")
      val magic = raw.length >= 2 &&
        (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b
      if (declared && !magic && raw.nonEmpty)
        throw new java.io.IOException(
          s"Content-Encoding: gzip on $url but body lacks the gzip " +
            "magic bytes — refusing to return a garbled page")
      val bytes =
        if (magic && (declared || gzPath)) gunzip(raw, url) else raw
      new String(bytes, "UTF-8")
    } finally conn.disconnect()
  }

  private def gunzip(raw: Array[Byte], url: String): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(raw))
      try in.readAllBytes() finally in.close()
    } catch {
      case e: java.util.zip.ZipException =>
        throw new java.io.IOException(
          s"gzip body from $url failed to inflate (truncated page?)", e)
    }
}
