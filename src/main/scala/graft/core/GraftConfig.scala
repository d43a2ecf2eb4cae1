package graft.core

/** Boot configuration loaded from a flat `key=value` ini file — the
  * reference's deploy surface (`haf_plug_play/config.py:20-46`,
  * `sample_config.ini`): six fields, consumed by the DB connector
  * (`database/core.py:8-21`) and the server bind (`server/serve.py:41-42`).
  *
  * Faithful behaviors: unknown keys are rejected (config.py's
  * `assert _key in CONFIG_FIELDS`); values are trimmed of trailing
  * whitespace; a missing file is answered by writing a blank template
  * with every field and refusing to boot (config.py creates the template
  * and exits — here the caller gets a `Left` so a library embedding
  * decides the exit policy itself).
  */
final case class GraftConfig(values: Map[String, String]) {
  def dbHost: String = values.getOrElse("db_host", "")
  def dbName: String = values.getOrElse("db_name", "")
  def dbUsername: String = values.getOrElse("db_username", "")
  def dbPassword: String = values.getOrElse("db_password", "")
  def serverHost: String = values.getOrElse("server_host", "")
  def serverPort: Int = values.get("server_port").flatMap(_.toIntOption).getOrElse(0)

  /** The JDBC form of `database/core.py`'s psycopg2 connection params. */
  def jdbcUrl: String = s"jdbc:postgresql://$dbHost/$dbName"
  def jdbcProps: Map[String, String] =
    Map("user" -> dbUsername, "password" -> dbPassword)
}

object GraftConfig {

  /** The complete key set (config.py `CONFIG_FIELDS`). */
  val Fields: Seq[String] = Seq(
    "db_host", "db_name", "db_username",
    "db_password", "server_host", "server_port")

  /** `PLUG_PLAY_HOME` override, same env contract as the reference. */
  def homeDir: String =
    sys.env.getOrElse("PLUG_PLAY_HOME", "/etc/haf-plug-play")

  def defaultConfigFile: String = s"$homeDir/config.ini"

  /** Parse ini text: one `key=value` per line, lines without '=' ignored
    * (comments/blanks), values split on the FIRST '=' so passwords may
    * contain one. Unknown keys fail the load.
    */
  def parse(text: String): Either[String, GraftConfig] = {
    val entries = text.linesIterator.filter(_.contains("=")).map { line =>
      val Array(k, v @ _*) = line.split("=", 2): @unchecked
      k.trim -> v.headOption.getOrElse("").trim
    }.toSeq
    entries.collectFirst {
      case (k, _) if !Fields.contains(k) => s"invalid config key detected $k"
    }.toLeft(GraftConfig(entries.toMap))
  }

  /** Load from a file. Missing file: write a blank template (every field,
    * empty value) and return Left, mirroring config.py's create-and-exit.
    */
  def load(configFile: String = defaultConfigFile): Either[String, GraftConfig] = {
    val path = java.nio.file.Paths.get(configFile)
    if (!java.nio.file.Files.exists(path)) {
      Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(path, Fields.map(f => s"$f=\n").mkString)
      Left("No config file detected. A blank one has been created. " +
        "Populate it with the correct details and restart.")
    } else parse(java.nio.file.Files.readString(path))
  }
}
