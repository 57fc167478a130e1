package graft.sources

/** Executor-side HTTP GET for [[Readers.httpFetchJson]] — deliberately
  * java.net.HttpURLConnection (JDK-only, serializable-free static call)
  * so fetch tasks need no extra dependency and no driver round trip.
  * Follows same-protocol redirects, fails loudly on any non-2xx status
  * (a silent empty page would truncate an ingestion window), and reads
  * the body fully so connections return to the JVM's keep-alive pool.
  */
private[sources] object HttpFetch {
  def get(url: String, headers: Map[String, String],
      connectTimeoutMs: Int, readTimeoutMs: Int): String = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestProperty("Accept", "application/json")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"HTTP $code fetching $url")
      val in = conn.getInputStream
      try new String(in.readAllBytes(), "UTF-8")
      finally in.close()
    } finally conn.disconnect()
  }
}
