package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** graft_json_get (fused flat-JSON field extraction) vs the builtin
  * `get_json_object` — exact agreement on valid documents (handcrafted +
  * seeded random), pinned divergences on malformed/exotic ones (see
  * JsonGetField scaladoc).
  */
class JsonGetSpec extends SparkSpec {

  private def native(doc: String, key: String = "k"): Option[String] =
    Option(graft.functions.JsonGetField.extract(
      UTF8String.fromString(doc), UTF8String.fromString(key).getBytes))
      .map(_.toString)

  /** Assert native == builtin for every doc, through real Spark plans
    * (exercises codegen, not just the interpreted eval).
    */
  private def compareAll(docs: Seq[String], key: String = "k"): Unit = {
    import spark.implicits._
    val rows = docs.toDF("j").select(
      col("j"),
      get_json_object(col("j"), s"$$.$key").as("builtin"),
      GraftBridge.jsonGet(col("j"), key).as("native")).collect()
    assert(rows.length === docs.length)
    rows.foreach { r =>
      val b = if (r.isNullAt(1)) null else r.getString(1)
      val n = if (r.isNullAt(2)) null else r.getString(2)
      assert(n === b, s"doc=<${r.getString(0)}> builtin=<$b> native=<$n>")
    }
  }

  test("agrees with the builtin on the handcrafted corpus") {
    compareAll(Seq(
      // scalars, nulls, whitespace, duplicate keys, key order
      """{"k":1}""", """{"k":-42}""", """{"k":0}""", """{"k":null}""",
      """{"k":true}""", """{"k":false}""", """{"k":""}""", """{"k":"v"}""",
      """{ "a" : 1 , "k" : 3 }""", """{"other":{"k":99},"k":7}""",
      """{"k":1,"k":2}""", """{"K":1}""", """{"kk":1}""", """{"":1}""",
      """{}""", """{"a":1}""", """{"k":9007199254740993}""",
      """{"k":-0.5}""", """{"k":3.14159}""",
      // nested values (target and skipped siblings)
      """{"k": {"a": 1, "b": [1, 2]}}""", """{"k": [1, "x", {"y": 2}]}""",
      """{"a":[{"k":1},2,[3]],"k":[]}""", """{"a":{"b":{"c":1}},"k":{}}""",
      """{"k":{"s":"with \" quote and } brace"}}""",
      """{"a":"str with , comma and : colon","k":5}""",
      // escapes in values and keys
      """{"k":"a\"b"}""", """{"k":"a\\b"}""", """{"k":"a\/b"}""",
      """{"k":"a\tb\nc\rd\fe\bf"}""",
      "{\"k\":\"\\u0041\\u00e9\\u4e2d\"}", "{\"k\":\"\\ud83d\\ude00\"}",
      "{\"a\\tb\":1,\"k\":2}", "{\"\\u006b\":77}", // escaped OTHER key / escaped "k"
      """{"k":"a😀b"}""", """{"k":"中文"}""",
      // nested re-serialization: escape normalization, both directions
      "{\"k\":[\"\\u0041\",\"a\\/b\",\"\\u00e9\"]}",
      "{\"k\":[\"é中\",\"😀\",\"\\ud83d\\ude00\"]}",
      "{\"k\":[\"a\\tb\\nc\\bd\\fe\\rf\",\"\\u0001\\u001f\"]}",
      "{\"k\":[\"q\\\"w\\\\e\"]}", "{\"k\":{\"ke\\u0079\":\"😀\"}}",
      """{"k": { "s" : [ 1 , true , null ] , "t" : "x y" }}""",
      // malformed where both return NULL
      """not json""", """[1,2,3]""", """"str"""", """123""", """{"k":01}""",
      """{"k":+1}""", """{"k":.5}""", """{"k":1.}""", """{"k":1e}""",
      """{"k":tru}""", """{"k":nul}""", """{"k":"unterminated""",
      """{"k"}""", """{"k":}""", """{"k" 1}""", """{"a":1.2.3,"k":5}""",
      "{\"k\":\"\\ud800\"}", "{\"k\":\"\\udc00x\"}", "{\"k\":\"\\ud800\\ud800\"}",
      "{\"k\":\"bad\\x\"}", "{\"k\":\"\\u12\"}", """""", """{""",
      // valid-to-us trailing content after a FOUND key (both return it)
      """{"k":5} trailing"""))
  }

  test("agrees with the builtin on seeded random flat-ish documents") {
    val keys = Seq("k", "id", "name", "值", "deep_key", "a b", "x\ty")
    def randomValue(rnd: scala.util.Random, depth: Int): String =
      rnd.nextInt(if (depth > 1) 6 else 8) match {
        case 0 => rnd.nextLong().toString
        case 1 => (rnd.nextDouble() * math.pow(10, rnd.nextInt(6))).toString
        case 2 => "null"
        case 3 => if (rnd.nextBoolean()) "true" else "false"
        case 4 =>
          val s = rnd.alphanumeric.take(rnd.nextInt(12)).mkString +
            Seq("", "\\n", "\\\"", "\\\\", "\\u00e9", "😀", "中", " , : } ] ")(rnd.nextInt(8))
          "\"" + s + "\""
        case 5 => rnd.nextInt(1000).toString
        case 6 => // nested object
          val n = rnd.nextInt(3)
          (0 until n).map(i => s""""n$i": ${randomValue(rnd, depth + 1)}""")
            .mkString("{", ", ", "}")
        case 7 => // nested array
          val n = rnd.nextInt(4)
          (0 until n).map(_ => randomValue(rnd, depth + 1)).mkString("[", ", ", "]")
      }
    for (seed <- Seq(1L, 7L, 42L, 99L, 12345L)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 300).map { _ =>
        val fields = rnd.shuffle(keys).take(1 + rnd.nextInt(keys.length))
          .map(kk => s""""${kk}": ${randomValue(rnd, 0)}""")
        val pad = if (rnd.nextBoolean()) " " else ""
        fields.mkString(s"{$pad", s",$pad", s"$pad}")
      }
      compareAll(docs) // "k" present ~85% of the time, absent otherwise
      compareAll(docs, "id")
      compareAll(docs, "deep_key")
    }
  }

  test("pinned divergences: lenient-on-malformed and number echo") {
    // builtin canonicalizes non-canonical floats through a double
    assert(native("""{"k":1e2}""") === Some("1e2")) // builtin: 100.0
    assert(native("""{"k":12.50}""") === Some("12.50")) // builtin: 12.5
    assert(native("""{"k":0.1e-3}""") === Some("0.1e-3")) // builtin: 1.0E-4
    // skipped siblings are structurally skipped, not re-validated: a doc
    // broken only INSIDE a skipped nested value can still yield the target
    assert(native("""{"a":{1 bad 2},"k":7}""") === Some("7")) // builtin: NULL
    // but structural breaks ON the walked path are caught
    assert(native("""{"a":1.2.3,"k":5}""") === None)
    assert(native("""{"a":1;"k":5}""") === None)
  }

  test("probe: builtin nested-string re-serialization rules") {
    import spark.implicits._
    val docs = Seq(
      "{\"k\":[\"\\u0041\"]}", // escaped ASCII in source
      "{\"k\":[\"a\\/b\"]}", // escaped slash
      "{\"k\":[\"\\u00e9\"]}", // escaped BMP
      "{\"k\":[\"é中\"]}", // raw BMP
      "{\"k\":[\"😀\"]}", // raw non-BMP
      "{\"k\":[\"\\ud83d\\ude00\"]}", // escaped non-BMP
      "{\"k\":[\"a\\tb\\nc\\bd\\fe\\rf\"]}", // short escapes
      "{\"k\":[\"\\u0001\\u001f\"]}", // other control chars
      "{\"k\":[\"q\\\"w\\\\e\"]}", // quote + backslash
      "{\"k\":{\"ke\\u0079\":1}}") // escaped char in nested KEY
    docs.toDF("j")
      .select(col("j"), get_json_object(col("j"), "$.k").as("v"))
      .collect().foreach { r =>
        val v = if (r.isNullAt(1)) "NULL" else s"<${r.getString(1)}>"
        info(s"reser: ${r.getString(0)} -> $v")
      }
  }

  test("SQL registration: graft_json_get is reachable from spark.sql") {
    GraftBridge.registerGraftFunctions(spark)
    val out = spark.sql(
      """SELECT graft_json_get('{"a":1,"k":"v"}', 'k') AS v""").collect()
    assert(out.head.getString(0) === "v")
  }
}
