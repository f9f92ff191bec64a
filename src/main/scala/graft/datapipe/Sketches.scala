package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) over a token
  * stream — the frequency primitive for when the vocabulary does NOT
  * fit anywhere: the sketch is a fixed depth×width count matrix, so
  * at 100 TB the shuffle carries (row, bucket, count) partials into
  * at most depth·width cells no matter how many distinct tokens
  * exist, and the estimate for any token is min over rows of its
  * bucket's count — an overestimate by construction (collisions only
  * add), never an undercount.
  *
  * Hash contract: row r hashes token t to
  * `md5_60("cms:" + r + ":" + t) mod width` — the catalog's
  * engine-portable md5 convention ([[TextAnalysis.md5Long60]]), so an
  * external engine rebuilds the identical sketch cell-for-cell with
  * no shipped state.
  */
object Sketches {

  /** The sketch itself: (r, b, cnt) rows, one per touched cell.
    * `tokens` must be a single-column DataFrame of token strings.
    */
  def cmsCounts(tokens: DataFrame, tokenCol: String,
                depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    tokens.select(explode(array((0 until depth).map { r =>
        struct(lit(r.toLong).as("r"), cmsBucket(col(tokenCol), r, width).as("b"))
      }: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Row-r bucket of a token — shared by build and probe sides so
    * the string contract lives in exactly one place.
    */
  def cmsBucket(token: Column, r: Int, width: Int): Column =
    TextAnalysis.md5Long60(concat(lit(s"cms:$r:"), token)) % width

  /** Point estimates for a (small) probe table: min over rows of the
    * probed cell. `probes` carries `tokenCol` (plus any passthrough
    * columns, which survive); the probe side broadcasts — it is the
    * heavy-hitter candidate list, never the corpus.
    */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, tokenCol: String,
                  depth: Int, width: Int): DataFrame = {
    val keep = probes.columns.map(col).toSeq
    val probed = probes.select(keep :+ explode(array((0 until depth).map { r =>
        struct(lit(r.toLong).as("r"), cmsBucket(col(tokenCol), r, width).as("b"))
      }: _*)).as("p"): _*)
      .select(keep :+ col("p.r").as("r") :+ col("p.b").as("b"): _*)
    cms.join(broadcast(probed), Seq("r", "b"))
      .groupBy(probes.columns.map(col): _*)
      .agg(min(col("cnt")).as("cms_est"))
  }
}
