package graft.functions

/** Remote HTTP embedder protocol core: the reference's OpenAI-style
  * embeddings client (`yamlpipe/components/embedders.py:62-91`) re-expressed
  * as a per-executor batch client. This object holds the driver-free pieces
  * (request encode, response parse, one POST); the distributed operator is
  * [[graft.operators.Embed.remote]] (mapPartitions, one client per
  * partition, bounded batches).
  *
  * Wire shape (OpenAI embeddings API):
  * {{{
  *   POST { "model": m, "input": [texts...] }
  *   <-   { "data": [ { "index": i, "embedding": [floats...] }, ... ] }
  * }}}
  * The response is parsed with Jackson ([[graft.functions.Json]]) — large
  * batched responses exceed SnakeYAML's default code-point limit.
  */
object RemoteEmbedder {

  val DefaultModel = "text-embedding-3-small" // reference default, embedders.py:70
  val DefaultBatchSize = 64

  def jsonEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def requestBody(model: String, texts: Seq[String],
                  dimensions: Option[Int] = None): String = {
    val dims = dimensions.map(d => s""","dimensions":$d""").getOrElse("")
    texts.map(t => "\"" + jsonEscape(t) + "\"")
      .mkString(s"""{"model":"${jsonEscape(model)}","input":[""", ",", s"]$dims}")
  }

  /** Parse the response into `n` row-aligned vectors (ordered by the
    * response's own `index` field, not arrival order). Fails loudly on a
    * count mismatch or missing index — a silently misaligned embedding
    * column is the worst failure mode an embed stage can have.
    */
  def parseResponse(body: String, n: Int): Array[Array[Float]] = {
    import scala.jdk.CollectionConverters._
    val root = Json.parse(body).asInstanceOf[java.util.Map[String, Any]]
    val data = root.get("data").asInstanceOf[java.util.List[Any]]
    require(data != null && data.size == n,
      s"embeddings response has ${if (data == null) 0 else data.size} entries for $n inputs")
    val out = new Array[Array[Float]](n)
    data.asScala.foreach { e =>
      val m = e.asInstanceOf[java.util.Map[String, Any]]
      val idx = m.get("index").asInstanceOf[Number].intValue()
      require(idx >= 0 && idx < n && out(idx) == null,
        s"embeddings response index $idx invalid or duplicated")
      val emb = m.get("embedding").asInstanceOf[java.util.List[Any]]
      val arr = new Array[Float](emb.size)
      var i = 0
      while (i < arr.length) { arr(i) = emb.get(i).asInstanceOf[Number].floatValue(); i += 1 }
      out(idx) = arr
    }
    require(out.forall(_ != null), "embeddings response is missing indices")
    out
  }

  def newClient(timeoutSeconds: Int): java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .build()

  /** One embeddings POST: n texts in, n row-aligned vectors out. Throws on
    * any non-2xx status with the body in the message (the reference
    * surfaces the API error verbatim, embedders.py:83-85). A configured
    * `dimensions` is passed through to the API (OpenAI v3 models honor it)
    * AND validated against every returned vector — a silently wrong-width
    * embedding column corrupts every downstream index.
    */
  def embedBatch(client: java.net.http.HttpClient, endpoint: String,
                 apiKey: Option[String], model: String, texts: Seq[String],
                 timeoutSeconds: Int = 30,
                 dimensions: Option[Int] = None): Array[Array[Float]] = {
    if (texts.isEmpty) return Array.empty
    val builder = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        requestBody(model, texts, dimensions)))
    apiKey.foreach(k => builder.header("Authorization", s"Bearer $k"))
    val resp = client.send(builder.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new IllegalStateException(
        s"embeddings POST $endpoint -> HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    val out = parseResponse(resp.body(), texts.size)
    dimensions.foreach { d =>
      out.find(_.length != d).foreach(v => throw new IllegalStateException(
        s"embeddings endpoint returned ${v.length}-dim vectors, configured dim is $d"))
    }
    out
  }
}
