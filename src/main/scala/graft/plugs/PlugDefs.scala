package graft.plugs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** A plug definition as loaded from a `defs.json` file — the reference's
  * pluggable-dataset boot unit (docs/plug-definitions.md:8-29; loaded per
  * plug directory at startup by database/haf.py `_init_plugs`, which
  * scans `plugs/<name>/defs.json` and registers the parsed definition).
  *
  * Field-for-field mirror of the reference file:
  *  - `name`: internal plug name (must match the directory name);
  *  - `props.enabled`: default on/off state (the reference ships polls
  *    disabled);
  *  - `props.schema` / `props.context`: namespace names — in this engine
  *    both inform the derived-table prefix only (there is no PostgreSQL
  *    schema or HAF context to create);
  *  - `props.start_block`: first block the plug's sync consumes;
  *  - `ops`: op-type-id → processing-function map ("18":
  *    "podping.process_cjop"). The reference resolves the function name
  *    against the SQL functions installed from the plug's functions.sql;
  *    this engine resolves it against [[PlugDefs.transforms]], the
  *    registry of compiled set-oriented transforms — the defs.json stays
  *    the single declarative source of WHICH ops feed WHICH processor
  *    from WHAT block, without recompiling.
  */
final case class PlugDef(name: String, enabled: Boolean, schema: String,
                         context: String, startBlock: Int,
                         ops: Map[Int, String]) {
  require(ops.nonEmpty, s"plug $name: defs.json must map at least one op id")
}

/** Loader + instantiation for [[PlugDef]]s (reference
  * database/haf.py:72-84: scandir over the plugs dir, one defs.json per
  * subdirectory, every boot).
  */
object PlugDefs {

  /** Processing-function registry: the engine-side resolution of the
    * defs.json `ops` values. The reference's `schema.function_name`
    * convention is kept verbatim so its shipped defs.json files load
    * unchanged.
    */
  val transforms: Map[String, Plug] = Map(
    "podping.process_cjop" -> Podping,
    "polls.process_cjop" -> Polls,
    "hive_engine.process_cjop" -> HiveEngine)

  /** Parse one defs.json document. Jackson (Spark's own JSON dependency)
    * rather than a regex scrape: defs files are user-authored, so
    * whitespace/ordering/escaping must not matter.
    */
  def parse(json: String): PlugDef = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(json)
    def req(n: com.fasterxml.jackson.databind.JsonNode, field: String) = {
      val v = n.get(field)
      require(v != null, s"defs.json: missing required field '$field'")
      v
    }
    val props = req(root, "props")
    val ops = req(root, "ops")
    val opPairs = ops.properties().iterator()
    val opMap = scala.collection.mutable.Map[Int, String]()
    while (opPairs.hasNext) {
      val e = opPairs.next()
      opMap(e.getKey.toInt) = e.getValue.asText()
    }
    PlugDef(
      name = req(root, "name").asText(),
      enabled = req(props, "enabled").asBoolean(),
      schema = req(props, "schema").asText(),
      context = req(props, "context").asText(),
      startBlock = req(props, "start_block").asInt(),
      ops = opMap.toMap)
  }

  /** Scan `dir` for plug subdirectories holding a defs.json — the
    * reference's `_is_valid_plug` walk. Malformed files fail LOUDLY
    * (boot-time config belongs to the operator; a silently skipped plug
    * is a missing dataset discovered weeks later). The reference's
    * directory-name rule is enforced the same way it documents it: the
    * `name` field must match the subdirectory.
    */
  def load(dir: java.io.File): Seq[PlugDef] =
    Option(dir.listFiles()).toSeq.flatten.filter(_.isDirectory).sortBy(_.getName)
      .flatMap { sub =>
        val f = new java.io.File(sub, "defs.json")
        if (!f.exists()) None
        else {
          val d = parse(new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8))
          require(d.name == sub.getName,
            s"defs.json name '${d.name}' must match its directory '${sub.getName}'")
          Some(d)
        }
      }

  /** Bind a definition to its compiled transform. The definition's
    * declarative fields WIN over the compiled defaults: op-type ids and
    * start block come from the JSON (the knobs the reference lets an
    * operator set per deployment), the set-oriented transform logic from
    * the registry.
    */
  def instantiate(d: PlugDef): Plug = {
    val impls = d.ops.values.toSeq.distinct.map { fn =>
      transforms.getOrElse(fn,
        throw new IllegalArgumentException(
          s"plug ${d.name}: unknown processing function '$fn' " +
            s"(known: ${transforms.keys.toSeq.sorted.mkString(", ")})"))
    }
    require(impls.distinct.size == 1,
      s"plug ${d.name}: all ops must dispatch to one processing function")
    new DefinedPlug(d, impls.head)
  }

  /** Load + instantiate every ENABLED plug under `dir` — the boot path
    * (disabled definitions are parsed and validated but not run, like
    * the reference's polls default).
    */
  def boot(dir: java.io.File): Seq[Plug] =
    load(dir).filter(_.enabled).map(instantiate)
}

/** A [[Plug]] whose identity (name, start block, op-type ids) comes from
  * a [[PlugDef]] and whose set-oriented logic delegates to a compiled
  * transform. The JSON's op-id set gates what reaches the transform —
  * same contract as the reference, where sync dispatches only the op ids
  * the defs file declares (database/sql/sync.sql op filter).
  */
final class DefinedPlug(d: PlugDef, impl: Plug) extends Plug {
  val name: String = d.name
  val startBlock: Int = d.startBlock
  val opTypeIds: Set[Int] = d.ops.keySet

  def filter(ops: DataFrame): DataFrame =
    impl.filter(ops.filter(col("op_type_id")
      .isin(opTypeIds.toSeq.map(Integer.valueOf): _*)))

  def transform(ops: DataFrame): Map[String, DataFrame] = impl.transform(ops)
}
