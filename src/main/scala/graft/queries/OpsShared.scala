package graft.queries

import graft.ops.Dedup

/** SQL fragments shared by the banded near-dup oracles across the dedup
  * (d2) and media (m5/m6/m7) families — split out of the former
  * `OpsQueries` monolith unchanged.
  */
private[queries] object OpsShared {

  /** DuckDB mirror of [[Dedup.cappedPairJoin]] — the banded→marked→cand
    * CTE chain (bucket-size window, star-cap skew guard, candidate
    * self-join) shared verbatim by the d2/m5/m6/m7 oracles, so the
    * skew-cap semantics live in ONE SQL spelling: if the Spark-side cap
    * ever changes, one helper changes with it instead of four strings
    * drifting independently. `bandedSelect` must yield
    * `($idCol, band, bucket)`; callers interpolate the result after
    * `with ` and close with their verify CTEs. No stripMargin inside —
    * the caller's stripMargin handles the `|` margins.
    */
  def candSqlCtes(bandedSelect: String, idCol: String): String =
    s"""banded as (
       |  $bandedSelect
       |), marked as (
       |  select $idCol, band, bucket,
       |    count(*) over (partition by band, bucket) as bsize,
       |    min($idCol) over (partition by band, bucket) as bmin
       |  from banded
       |), cand as (
       |  select distinct d1, d2 from (
       |    select a.$idCol as d1, b.$idCol as d2
       |    from marked a
       |    join marked b on a.band = b.band and a.bucket = b.bucket
       |      and a.$idCol < b.$idCol
       |    where a.bsize <= ${Dedup.DefaultMaxBucketSize}
       |    union all
       |    select bmin, $idCol
       |    from marked
       |    where bsize > ${Dedup.DefaultMaxBucketSize} and $idCol <> bmin)
       |)"""

  /** The 64-bit-fingerprint banded select over a staged `sigs` CTE —
    * d2/m5/m6's shared `bandedSelect` argument for [[candSqlCtes]].
    */
  val SimhashBandedSelect: String =
    "select s.doc_id, g.band, (s.simhash >> (g.band * 16)) & 65535 " +
      "as bucket from sigs s cross join range(4) g(band)"
}
