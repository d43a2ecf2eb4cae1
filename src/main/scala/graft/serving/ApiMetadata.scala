package graft.serving

/** API metadata document — title/description/version/contact/license/tags
  * (reference `utils/api_metadata.py:1-36`, mounted on the FastAPI app in
  * `server/serve.py:12-21`). FastAPI folds these into its OpenAPI doc;
  * here the same document is a JSON payload served at `/api/metadata`
  * and embedded in the `/api` root report.
  */
object ApiMetadata {

  val Title = "graft plug & play (API)"

  val Description: String =
    "A turnkey tool to extract and process custom data sets from an " +
      "op-log chain and create APIs for them. Each enabled \"plug\" has " +
      "its own root endpoint path under /api and sub-endpoints under it."

  val Version = "1.0"

  val Contact: Map[String, Any] = Map("name" -> "graft")

  val License: Map[String, Any] = Map("name" -> "MIT License")

  /** One tag per endpoint family (api_metadata.py `TAGS_METADATA`; the
    * reference ships system + podping — polls endpoints are served here
    * too, so the tag list covers them).
    */
  val Tags: Seq[Map[String, Any]] = Seq(
    Map("name" -> "system",
      "description" -> "System endpoints"),
    Map("name" -> "podping",
      "description" -> ("Podping is a distributed notification system for " +
        "new podcast episodes based on an op-log chain")),
    Map("name" -> "polls",
      "description" -> "Decentralized polls: create, vote, tally"))

  def json: String = JsonOut.obj(
    Map(
      "title" -> Title,
      "description" -> Description,
      "version" -> Version,
      "contact" -> Contact,
      "license" -> License,
      "tags" -> Tags),
    Seq("title", "description", "version", "contact", "license", "tags"))
}
