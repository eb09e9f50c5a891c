package graft.functions

/** JSON parsing for remote-protocol payloads (embeddings responses, Chroma
  * REST bodies). Jackson — already on the Spark classpath — instead of
  * SnakeYAML: SnakeYAML 2.x enforces a ~3 MiB default code-point limit on
  * `load()`, which a legitimately large embeddings response (batch 128 ×
  * 3072 dims) or a collection `get` of a non-tiny collection exceeds,
  * failing the job on a healthy payload. The stream-read constraints are
  * raised explicitly so the only payload bound is executor memory, which the
  * callers already bound via batch sizes.
  *
  * Produces the same `java.util.Map` / `java.util.List` / `Number` tree
  * shape SnakeYAML did, so call sites are drop-in.
  */
object Json {

  private val mapper: com.fasterxml.jackson.databind.ObjectMapper = {
    val constraints = com.fasterxml.jackson.core.StreamReadConstraints.builder()
      .maxStringLength(Int.MaxValue)
      .maxNestingDepth(1000)
      .build()
    val factory = new com.fasterxml.jackson.core.JsonFactory()
    factory.setStreamReadConstraints(constraints)
    new com.fasterxml.jackson.databind.ObjectMapper(factory)
  }

  /** Parse a JSON document into java.util.Map / java.util.List / Number /
    * String / Boolean / null.
    */
  def parse(body: String): Any = mapper.readValue(body, classOf[Object])

  /** Serialize a java.util.Map / java.util.List / scalar tree to JSON
    * (insertion order preserved for LinkedHashMap). Fixture writers use
    * this so any payload character gets REAL JSON escaping rather than
    * hand-rolled string splicing.
    */
  def write(value: Any): String = mapper.writeValueAsString(value)
}
