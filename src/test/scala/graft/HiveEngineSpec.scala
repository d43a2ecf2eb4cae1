package graft

import graft.plugs.HiveEngine

class HiveEngineSpec extends SparkSpec {
  import Fixtures._

  private def transfer(symbol: String, to: String, qty: String, memo: String = "m") =
    s"""{"contractName": "tokens", "contractAction": "transfer",
       | "contractPayload": {"symbol": "$symbol", "to": "$to",
       | "quantity": "$qty", "memo": "$memo"}}""".stripMargin.replace("\n", "")

  private def fixture = opLog(spark, Seq(
    op(1, 10, 0, "2024-01-01 00:00:00", "ssc-mainnet-hive", transfer("BEE", "bob", "1.2345678901")),
    op(2, 10, 1, "2024-01-01 00:00:03", "ssc-mainnet-hive", transfer("BEE", "null", "0.5")),
    op(3, 11, 0, "2024-01-01 00:00:06", "ssc-mainnet-hive",
      """{"contractName": "tokens", "contractAction": "issue",
        | "contractPayload": {"symbol": "GOLD", "to": "carol", "quantity": "10"}}""".stripMargin.replace("\n", "")),
    op(4, 11, 1, "2024-01-01 00:00:09", "ssc-mainnet-hive",
      """{"contractName": "nft", "contractAction": "issue",
        | "contractPayload": {"symbol": "CITY", "to": "dan"}}""".stripMargin.replace("\n", "")),
    op(5, 12, 0, "2024-01-01 00:00:12", "other-op", transfer("X", "y", "1")),
    corruptOp(6, 12, "2024-01-01 00:00:15")))

  private lazy val t = HiveEngine.transform(fixture)

  test("contract dispatch: transfers / issuances / burns / nfts") {
    assert(t("transfers").count() === 2)
    assert(t("issuances").count() === 1)
    assert(t("burns").count() === 1) // the to='null' transfer
    assert(t("nfts").count() === 1)
  }

  test("quantity is exact NUMERIC(18,10)") {
    val q = t("transfers").orderBy("id").collect().head.getAs[java.math.BigDecimal]("quantity")
    assert(q === new java.math.BigDecimal("1.2345678901").setScale(10))
  }

  test("non-matching op ids and corrupt bodies are excluded") {
    val ids = t("transfers").select("id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(5L) && !ids.contains(6L))
  }
}
