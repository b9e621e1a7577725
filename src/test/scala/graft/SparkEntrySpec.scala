package graft

class SparkEntrySpec extends SparkSpec {

  test("driver contract: entry flagship returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract: every oracle key has a query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("driver contract: module maps never collide on query names") {
    // SparkEntry merges module maps with ++ — a duplicate name would
    // silently drop a query from the verified catalog
    val mods = Seq(
      operators.CorpusQueries.queries, operators.RelationalQueries.queries,
      operators.DedupQueries.queries, operators.TextQueries.queries,
      operators.EmbeddingQueries.queries, operators.SamplingQueries.queries,
      operators.MultimodalQueries.queries, operators.OlapQueries.queries,
      operators.SourceQueries.queries)
    val total = mods.map(_.size).sum
    assert(total === SparkEntry.queries.size,
      "duplicate query names across modules")
  }

  test("driver contract: oracle SQL survives the Verify JSON escaping") {
    // round-trip the writer's hand-rolled JSON through a strict parser
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    assert(json.startsWith("{") && json.endsWith("}"))
    assert(!json.exists(c => c < ' '), "unescaped control char in oracle json")
  }
}
