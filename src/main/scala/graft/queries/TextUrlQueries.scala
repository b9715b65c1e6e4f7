package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import TextShared.{round, toks}

/** Scrubbing / URL hygiene operators over `documents` (t44-t47): PII
  * scrub, CCNet line dedup, BM25 retrieval, URL canonicalization with
  * per-domain caps. Split out of the former `TextQueries` monolith
  * unchanged.
  */
object TextUrlQueries {

  /** PII detection + masking — the scrubbing pass every LLM corpus runs
    * before training (e.g. the C4/The-Pile preprocessing described in
    * Raffel et al. 2020; span categories follow common DLP practice:
    * emails, NANP-shaped phone numbers, SSN-shaped ids). The synthetic
    * corpus is lowercase-alnum only, so PII spans are first injected
    * deterministically from `doc_id` (both engines apply the identical
    * augmentation — the cross-engine check exercises the regex machinery,
    * not the generator). Detection uses `regexp_count`, masking chained
    * `regexp_replace` (email→phone→ssn; the three patterns are mutually
    * non-overlapping by construction, so order only matters for
    * determinism). Pure codegen'd column expressions — zero-shuffle
    * single-pass projection over the corpus; only the output sort moves
    * data, and at 100 TB the sort is dropped and the masked text is
    * written back partition-local.
    */
  val t44 = Q(
    "t44_pii_scrub",
    (s, dir) => {
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
      val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
      val id = col("doc_id")
      def pad(m: Int, w: Int) = lpad((id % m).cast("string"), w, "0")
      val aug = concat(
        col("text"),
        when(id % 3 === 0,
          concat(lit(" contact user"), id.cast("string"),
            lit("@mail.example.com"))).otherwise(""),
        when(id % 4 === 0,
          concat(lit(" call 555-"), pad(1000, 3), lit("-"), pad(10000, 4)))
          .otherwise(""),
        when(id % 5 === 0, concat(lit(" id 123-45-"), pad(10000, 4)))
          .otherwise(""))
      val masked = regexp_replace(
        regexp_replace(
          regexp_replace(aug, emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]"),
        ssnRe, "[SSN]")
      val nPii = col("n_email") + col("n_phone") + col("n_ssn")
      Tables.documents(s, dir)
        .select(
          id,
          regexp_count(aug, lit(emailRe)).cast("long").as("n_email"),
          regexp_count(aug, lit(phoneRe)).cast("long").as("n_phone"),
          regexp_count(aug, lit(ssnRe)).cast("long").as("n_ssn"),
          md5(masked).as("masked_md5"))
        .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ssn"),
          nPii.as("n_pii"), (nPii > 0).as("has_pii"), col("masked_md5"))
        .orderBy("doc_id")
    },
    Some("""with aug as (
      select doc_id,
        text
        || case when doc_id % 3 = 0
           then ' contact user' || doc_id || '@mail.example.com' else '' end
        || case when doc_id % 4 = 0
           then ' call 555-' || lpad((doc_id % 1000)::varchar, 3, '0')
                || '-' || lpad((doc_id % 10000)::varchar, 4, '0') else '' end
        || case when doc_id % 5 = 0
           then ' id 123-45-' || lpad((doc_id % 10000)::varchar, 4, '0')
           else '' end as text
      from documents
    ), hits as (
      select doc_id,
        cast(len(regexp_extract_all(text,
          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) as bigint) as n_email,
        cast(len(regexp_extract_all(text,
          '\b\d{3}-\d{3}-\d{4}\b')) as bigint) as n_phone,
        cast(len(regexp_extract_all(text,
          '\b\d{3}-\d{2}-\d{4}\b')) as bigint) as n_ssn,
        md5(regexp_replace(regexp_replace(regexp_replace(text,
          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
          '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
          '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g')) as masked_md5
      from aug
    )
    select doc_id, n_email, n_phone, n_ssn,
      n_email + n_phone + n_ssn as n_pii,
      n_email + n_phone + n_ssn > 0 as has_pii,
      masked_md5
    from hits order by doc_id"""),
    "PII scrub: regex detect + mask (email/phone/ssn), per-doc span counts")

  /** Line-level boilerplate removal — the CCNet / RefinedWeb pass (Wenzek
    * et al. 2020 §4.1; Penedo et al. 2023 §3) that drops lines repeated
    * across many documents of the same source (navigation chrome,
    * copyright footers) before doc-level dedup ever runs. The synthetic
    * corpus has no newlines, so each doc is first decomposed into lines
    * deterministically (identically in both engines): a per-source header,
    * 10-token content chunks, a per-source footer — the header/footer play
    * the role of real-web boilerplate and appear in all 25 docs of a
    * source. A line is dropped when its document-frequency within its
    * source reaches 5. Shape: one explode, one (source, line) groupBy for
    * the frequency table, one shuffle join back, one per-doc re-aggregate
    * — the exact two-shuffle profile a 100 TB CCNet run has. At that scale
    * the join key becomes xxhash64(line) to cut shuffle width (collision
    * rate 2^-64 per pair); kept exact here for cross-engine parity. The
    * kept-line text round-trips through an order-preserving md5 so a
    * dropped-or-reordered line can't hide behind matching counts.
    */
  val t45 = Q(
    "t45_line_dedup",
    (s, dir) => {
      val tk = toks(col("text"))
      val header = concat(lit("about "), col("source"),
        lit(" terms of use apply"))
      val footer = concat(lit("copyright "), col("source"),
        lit(" all rights reserved"))
      // Fused native chunker (one eval/doc) — replaces the
      // transform(sequence)/slice/array_join HOF nest, whose interpreted
      // lambda path JIT-deoptimizes on its first large run (ScaleCheck,
      // PERF.md round-7); byte-identical output, ChunkSpec-verified.
      val content = graft.expressions.ChunkJoin(tk, 10)
      val lines = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          posexplode(concat(array(header), content, array(footer))))
        .withColumnRenamed("col", "line")
      val freq = lines.groupBy("source", "line")
        .agg(countDistinct("doc_id").as("df"))
      val kept = lines.join(freq.where(col("df") < 5), Seq("source", "line"))
      val tot = lines.groupBy("doc_id")
        .agg(count(lit(1)).as("n_lines"))
      val ka = kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          md5(array_join(
            transform(
              array_sort(collect_list(struct(col("pos"), col("line")))),
              e => e.getField("line")),
            "\n")).as("kept_md5"))
      tot.join(ka, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_lines"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_lines") - coalesce(col("n_kept"), lit(0L)))
            .as("n_dropped"),
          coalesce(col("kept_md5"), md5(lit(""))).as("kept_md5"))
        .orderBy("doc_id")
    },
    Some("""with tok as (
      select doc_id, source, string_split(text, ' ') as t from documents
    ), lines0 as (
      select doc_id, source, 0 as pos,
        'about ' || source || ' terms of use apply' as line from tok
      union all
      select doc_id, source, i + 1 as pos,
        array_to_string(t[i * 10 + 1 : i * 10 + 10], ' ') as line
      from (select doc_id, source, t,
              unnest(range(cast(ceil(len(t) / 10.0) as bigint))) as i
            from tok) s
      union all
      select doc_id, source, 1000000 as pos,
        'copyright ' || source || ' all rights reserved' as line from tok
    ), freq as (
      select source, line, count(distinct doc_id) as df
      from lines0 group by 1, 2
    ), kept as (
      select l.doc_id, l.pos, l.line
      from lines0 l join freq f on l.source = f.source and l.line = f.line
      where f.df < 5
    ), tot as (
      select doc_id, cast(count(*) as bigint) as n_lines
      from lines0 group by 1
    ), ka as (
      select doc_id, cast(count(*) as bigint) as n_kept,
        md5(string_agg(line, chr(10) order by pos)) as kept_md5
      from kept group by 1
    )
    select t.doc_id, t.n_lines,
      coalesce(k.n_kept, 0) as n_kept,
      t.n_lines - coalesce(k.n_kept, 0) as n_dropped,
      coalesce(k.kept_md5, md5('')) as kept_md5
    from tot t left join ka k on t.doc_id = k.doc_id
    order by t.doc_id"""),
    "CCNet-style line dedup: drop high-doc-frequency lines within source")

  /** BM25 ranked retrieval (Robertson & Zaragoza 2009; Lucene's idf
    * smoothing `ln((N-df+0.5)/(df+0.5)+1)`, k1=1.2, b=0.75) for a fixed
    * query panel — the full-text-search primitive a data pipeline uses for
    * eval-set retrieval, decontamination lookups, and hard-negative
    * mining (t15 scores terms per doc; this ranks DOCS per query). Scale
    * shape is the inverted-index access path: the panel-term filter runs
    * BEFORE the tf groupBy, so only postings for panel terms ever shuffle
    * (at 100 TB that's |panel terms| postings lists, not the corpus); doc
    * lengths are a zero-shuffle projection, the corpus stats a 1-row
    * broadcast, and the panel join a broadcast. Scores round at 6 after
    * the per-query sum; ranks tie-break on doc_id for cross-engine
    * determinism.
    */
  val t46 = Q(
    "t46_bm25",
    (s, dir) => {
      val panel = Seq(
        (1, "customer"), (1, "table"), (1, "join"),
        (2, "stream"), (2, "window"), (2, "data"),
        (3, "fast"), (3, "hash"), (3, "value"))
      val terms = panel.map(_._2).distinct
      val (k1, b) = (1.2, 0.75)
      val docs = Tables.documents(s, dir)
      val tf = docs
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .filter(col("token").isInCollection(terms))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val withDf = tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy("token")))
      val dl = docs.select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("dl"))
      val stats = dl.agg(avg("dl").as("avgdl"), count(lit(1)).as("n_docs"))
      val spark = s
      import spark.implicits._
      val contrib = withDf
        .join(broadcast(panel.toDF("query_id", "term")),
          col("token") === col("term"))
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("c",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            col("tf") * (k1 + 1) /
            (col("tf") + (col("dl") / col("avgdl") * b + (1 - b)) * k1))
      val w = Window.partitionBy("query_id")
        .orderBy(col("bm25").desc, col("doc_id"))
      contrib.groupBy("query_id", "doc_id")
        .agg(round(sum(col("c")), 6).as("bm25"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy("query_id", "rank")
    },
    Some("""with panel(query_id, term) as (
      values (1,'customer'),(1,'table'),(1,'join'),
             (2,'stream'),(2,'window'),(2,'data'),
             (3,'fast'),(3,'hash'),(3,'value')
    ), toks as (
      select doc_id, unnest(string_split(text, ' ')) as token from documents
    ), dl as (
      select doc_id, cast(len(string_split(text, ' ')) as bigint) as dl
      from documents
    ), stats as (
      select avg(dl) as avgdl, count(*) as n_docs from dl
    ), tf as (
      select doc_id, token, cast(count(*) as bigint) as tf from toks
      where token in (select term from panel) group by 1, 2
    ), df as (
      select token, cast(count(*) as bigint) as df from tf group by 1
    ), contrib as (
      select p.query_id, tf.doc_id,
        ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
          tf.tf * 2.2 /
          (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) as c
      from tf
      join df using (token)
      join panel p on p.term = tf.token
      join dl on dl.doc_id = tf.doc_id
      cross join stats s
    ), scored as (
      select query_id, doc_id, round(sum(c), 6) + 0.0 as bm25
      from contrib group by 1, 2
    )
    select query_id, doc_id, bm25, rank from (
      select query_id, doc_id, bm25,
        cast(row_number() over (partition by query_id
          order by bm25 desc, doc_id) as int) as rank
      from scored) t
    where rank <= 5
    order by query_id, rank"""),
    "BM25 ranked retrieval: panel-term postings only, top-5 docs per query")

  /** URL canonicalization + per-domain document caps — RefinedWeb §3.1's
    * pre-dedup step (Penedo et al. 2023): normalize URLs (lowercase host,
    * strip `www.` and query-tracking params — the utm_*, ref, fbclid family)
    * so syntactic variants of one page collapse, then cap each domain's
    * document count so no single site dominates the training mixture. The
    * corpus has no URL column, so URLs are injected deterministically from
    * `doc_id` (both engines build identical strings — mixed-case hosts,
    * www. prefixes, tracking params, a sqrt-skewed domain distribution so
    * some domains exceed the cap and some don't); the cross-engine check
    * exercises the CANONICALIZATION, which Spark does with native
    * `parse_url` + regexp/HOF expressions and DuckDB independently with
    * its own regexp/list functions. The cap is a rank-filter (row_number
    * per domain by doc_id — deterministic), NEVER a collect: one window
    * shuffle on the domain key, one per-domain rollup reusing that
    * partitioning, corpus share from a whole-output window over ≤40 rollup
    * rows. At 100 TB this is exactly one wide shuffle of (domain, doc)
    * pairs — the same profile the RefinedWeb pipeline reports.
    */
  val t47 = Q(
    "t47_domain_caps",
    (s, dir) => {
      val id = col("doc_id")
      val domIdx = floor(sqrt((id % 1600).cast("double"))).cast("int")
      val tld = element_at(array(lit("com"), lit("org"), lit("net")),
        (domIdx % 3) + 1)
      val hostRaw = concat(lit("site"), domIdx.cast("string"),
        lit(".example."), tld)
      val url = concat(
        when(id % 2 === 0, lit("https")).otherwise(lit("http")), lit("://"),
        when(id % 5 === 0, lit("www.")).otherwise(lit("")),
        when(id % 7 === 0, upper(hostRaw)).otherwise(hostRaw),
        lit("/p/"), (id % 13).cast("string"),
        when(id % 3 === 0,
          concat(lit("?utm_source=feed&id="), (id % 11).cast("string"),
            lit("&utm_campaign=c&ref=x")))
          .when(id % 3 === 1, concat(lit("?id="), (id % 11).cast("string")))
          .otherwise(lit("")))
      val withUrl = Tables.documents(s, dir).select(id, url.as("url"))
      val domain = regexp_replace(
        lower(expr("parse_url(url, 'HOST')")), "^www\\.", "")
      val keptQ = array_join(
        filter(split(coalesce(expr("parse_url(url, 'QUERY')"), lit("")), "&"),
          p => p =!= "" && !p.rlike("^(utm_[a-z]+|ref|fbclid)=")), "&")
      val canon = concat(domain, expr("parse_url(url, 'PATH')"),
        when(length(keptQ) > 0, concat(lit("?"), keptQ)).otherwise(lit("")))
      val ranked = withUrl
        .select(id, domain.as("domain"), canon.as("canonical_url"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("domain").orderBy("doc_id")))
      ranked.groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rk") <= 50, 1L).otherwise(0L)).as("n_kept"),
          min(when(col("rk") <= 50, col("canonical_url"))).as("first_url"))
        .select(col("domain"), col("n_docs"), col("n_kept"),
          (col("n_docs") > col("n_kept")).as("capped"),
          graft.Norm.rz(
            col("n_docs") / sum(col("n_docs")).over(Window.partitionBy()), 6)
            .as("corpus_share"),
          col("first_url"))
        .orderBy("domain")
    },
    Some("""with base as (
      select doc_id, cast(floor(sqrt(doc_id % 1600)) as int) as k
      from documents
    ), urls as (
      select doc_id,
        (case when doc_id % 2 = 0 then 'https' else 'http' end) || '://' ||
        (case when doc_id % 5 = 0 then 'www.' else '' end) ||
        (case when doc_id % 7 = 0 then upper(h) else h end) ||
        '/p/' || (doc_id % 13)::varchar ||
        (case when doc_id % 3 = 0
           then '?utm_source=feed&id=' || (doc_id % 11)::varchar
                || '&utm_campaign=c&ref=x'
          when doc_id % 3 = 1 then '?id=' || (doc_id % 11)::varchar
          else '' end) as url
      from (
        select doc_id,
          'site' || k::varchar || '.example.' ||
            (case k % 3 when 0 then 'com' when 1 then 'org' else 'net' end)
            as h
        from base)
    ), canon as (
      select doc_id,
        regexp_replace(lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)),
          '^www\.', '') as domain,
        regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) as path,
        array_to_string(list_filter(string_split(
            case when contains(url, '?')
              then regexp_extract(url, '\?(.*)$', 1) else '' end, '&'),
          x -> x <> '' and not regexp_matches(x,
            '^(utm_[a-z]+|ref|fbclid)=')), '&') as keptq
      from urls
    ), ranked as (
      select doc_id, domain,
        domain || path ||
          case when keptq <> '' then '?' || keptq else '' end
          as canonical_url,
        row_number() over (partition by domain order by doc_id) as rk
      from canon
    )
    select domain,
      cast(count(*) as bigint) as n_docs,
      cast(sum(case when rk <= 50 then 1 else 0 end) as bigint) as n_kept,
      count(*) > sum(case when rk <= 50 then 1 else 0 end) as capped,
      round(count(*) / (sum(count(*)) over ()), 6) + 0.0 as corpus_share,
      min(case when rk <= 50 then canonical_url end) as first_url
    from ranked
    group by domain
    order by domain"""),
    "URL canonicalization + per-domain caps: parse_url normalize, tracking-param strip, rank-filter cap, share stats")
}
