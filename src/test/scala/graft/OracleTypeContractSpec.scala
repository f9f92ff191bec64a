package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.sys.process._

import graft.queries.Catalog

/** The oracle side of the output-type contract, pinned as an sbt test
  * (previously enforced only inside tools/local_verify.py): DESCRIBE
  * every `Catalog.oracleSql` entry through DuckDB — no execution —
  * and assert
  *
  *  1. every oracle column type is in the 4-type set
  *     VARCHAR / BIGINT / DOUBLE / BOOLEAN (DuckDB widenings like
  *     SUM(BIGINT)→HUGEINT hash-mismatch the driver's dtype-sensitive
  *     comparator even when values agree — the round-10 red cluster);
  *  2. the oracle's (column → type) map equals the Spark plan's
  *     schema column-for-column under the LongType→BIGINT /
  *     DoubleType→DOUBLE / StringType→VARCHAR / BooleanType→BOOLEAN
  *     mapping (a name present on one side only, or a cross-engine
  *     type drift, is exactly what the driver's canonicalized hash
  *     would flag at round time).
  *
  * DuckDB lives in the driver-side python environment, not on the
  * sbt classpath, so the spec shells out to
  * `python3 tools/oracle_describe.py`; if that environment is absent
  * (no python3 / no duckdb module) the suite cancels rather than
  * failing — the contract is then still enforced by the driver's own
  * gate, just not locally.
  */
class OracleTypeContractSpec extends SparkSpec {

  private val duckToSpark = Map(
    "VARCHAR" -> "string", "BIGINT" -> "bigint",
    "DOUBLE" -> "double", "BOOLEAN" -> "boolean")

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  test("every oracle DESCRIBEs to the 4-type contract and matches the Spark schema") {
    val probe = try {
      Seq("python3", "-c", "import duckdb").!(ProcessLogger(_ => ()))
    } catch { case _: Throwable => 1 }
    assume(probe == 0, "python3+duckdb unavailable; driver gate still enforces this")

    val oracle = Catalog.oracleSql
    val json = oracle.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val tmp = Files.createTempFile("oracle_sql", ".json")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))

    val out = new StringBuilder
    val code = Seq("python3", "tools/oracle_describe.py", tmp.toString,
      "/root/testdata/sf0.001")
      .!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    Files.deleteIfExists(tmp)
    assert(code == 0, s"oracle_describe.py failed:\n${out.toString.take(2000)}")

    // duckdb types per (query, column)
    val duckTypes: Map[String, Map[String, String]] = out.toString
      .linesIterator.filter(_.startsWith("TYPE ")).map { l =>
        val parts = l.split(" ", 4)
        (parts(1), parts(2), parts(3))
      }.toSeq.groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(r => r._2 -> r._3).toMap }

    val missing = oracle.keySet -- duckTypes.keySet
    assert(missing.isEmpty, s"oracles that failed to DESCRIBE: $missing")

    val violations = Seq.newBuilder[String]
    for ((name, cols) <- duckTypes.toSeq.sortBy(_._1)) {
      // plan-only: .schema analyzes without executing
      val sparkSchema = Catalog.queries(name)(spark, sf).schema
        .fields.map(f => f.name -> f.dataType.simpleString).toMap
      for ((c, t) <- cols) duckToSpark.get(t) match {
        case None =>
          violations += s"$name.$c: oracle type $t outside the 4-type set"
        case Some(sparkT) =>
          sparkSchema.get(c) match {
            case None =>
              violations += s"$name.$c: oracle-only column (spark lacks it)"
            case Some(st) if st != sparkT =>
              violations += s"$name.$c: oracle $t↔$sparkT but spark has $st"
            case _ => ()
          }
      }
      val oracleOnly = sparkSchema.keySet -- cols.keySet
      if (oracleOnly.nonEmpty)
        violations += s"$name: spark-only columns ${oracleOnly.mkString(",")}"
    }
    val v = violations.result()
    assert(v.isEmpty,
      s"${v.size} output-type contract violations:\n${v.take(40).mkString("\n")}")
  }
}
