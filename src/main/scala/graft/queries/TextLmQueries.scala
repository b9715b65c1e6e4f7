package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import TextShared.{bigrams, round, stopwords, toks}

/** Statistical language-model / tokenizer operators over `documents`
  * (t22/t23, t28-t30, t32, t36-t38): bigram LM + cross-entropy, CCNet
  * perplexity buckets, the logistic quality classifier, BPE induction
  * and apply, DSIR importance weights, token entropy, Kneser-Ney
  * perplexity. Split out of the former `TextQueries` monolith unchanged.
  */
object TextLmQueries {


  /** Count-based bigram language model — the statistic behind
    * perplexity-style quality filters: corpus-wide bigram counts and the
    * conditional probability P(w2|w1) = n(w1 w2) / n(w1 ·). One explode
    * and one bigram shuffle build the whole model; the conditional
    * denominator rides a window over the grouped table (rows per w1 =
    * distinct continuations, not corpus positions), so no second
    * aggregate-and-join pass. Integer counts; the probability is one
    * exact division rounded at the output.
    */
  val t22 = Q(
    "t22_bigram_model",
    (s, dir) => {
      val counts = bigrams(Tables.documents(s, dir))
        .select(split(col("bigram"), " ").getItem(0).as("w1"), col("bigram"))
        .groupBy("w1", "bigram").agg(count(lit(1)).as("n"))
      counts
        .withColumn("n_w1",
          sum("n").over(Window.partitionBy("w1")))
        .withColumn("p_cond", round(col("n") / col("n_w1").cast("double"), 6))
        .select(col("bigram"), col("n"), col("n_w1").cast("long").as("n_w1"),
          col("p_cond"))
        .orderBy("bigram")
    },
    Some("""with tok as (
      select doc_id, string_split(text, ' ') as t from documents
      where len(string_split(text, ' ')) >= 2
    ), bg as (
      select doc_id, t[i] || ' ' || t[i + 1] as bigram
      from (select doc_id, t, generate_subscripts(t, 1) as i from tok) s
      where i <= len(t) - 1
    ), counts as (
      select string_split(bigram, ' ')[1] as w1, bigram, count(*) as n
      from bg group by 1, 2
    )
    select bigram, n,
      cast(sum(n) over (partition by w1) as bigint) as n_w1,
      round(n / cast(sum(n) over (partition by w1) as double), 6) + 0.0 as p_cond
    from counts
    order by bigram"""),
    "bigram LM: corpus counts + conditional P(w2|w1) in one shuffle + one window")

  /** Per-document cross-entropy under the corpus bigram model (t22) — the
    * perplexity-style quality score: mean −ln P(w2|w1) over the document's
    * bigram occurrences. The model is built and joined in one job; the
    * join key is the bigram string, so the corpus moves twice (model
    * build, score join) and nothing is quadratic. Docs scoring near 0 are
    * the degenerate/repetitive ones (their transitions dominate the
    * corpus), the same signal real LM-based filters cut on.
    */
  val t23 = Q(
    "t23_cross_entropy",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val bg = bigrams(docs)
      val model = bg
        .select(split(col("bigram"), " ").getItem(0).as("w1"), col("bigram"))
        .groupBy("w1", "bigram").agg(count(lit(1)).as("n"))
        .withColumn("p_cond",
          col("n") / sum("n").over(Window.partitionBy("w1")).cast("double"))
        .select("bigram", "p_cond")
      bg.join(model, Seq("bigram"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(-log(col("p_cond"))), 6).as("cross_entropy"))
        .orderBy("doc_id")
    },
    Some("""with tok as (
      select doc_id, string_split(text, ' ') as t from documents
      where len(string_split(text, ' ')) >= 2
    ), bg as (
      select doc_id, t[i] || ' ' || t[i + 1] as bigram
      from (select doc_id, t, generate_subscripts(t, 1) as i from tok) s
      where i <= len(t) - 1
    ), counts as (
      select string_split(bigram, ' ')[1] as w1, bigram, count(*) as n
      from bg group by 1, 2
    ), model as (
      select bigram,
        n / cast(sum(n) over (partition by w1) as double) as p_cond
      from counts
    )
    select b.doc_id, count(*) as n_bigrams,
      round(avg(-ln(m.p_cond)), 6) + 0.0 as cross_entropy
    from bg b join model m on b.bigram = m.bigram
    group by b.doc_id
    order by b.doc_id"""),
    "LM cross-entropy: mean −ln P(w2|w1) per doc under the corpus bigram model")

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): split
    * each language's documents into head/middle/tail terciles of LM
    * cross-entropy — the cut CCNet uses to keep the well-modeled third of
    * a crawl. Reuses the t22 corpus bigram model and the t23 per-doc
    * scoring chain, then adds ONE per-language window. Tercile membership
    * is decided on the ROUND-6 score with a doc_id tie-break, so a
    * cross-engine summation ulp in the unrounded mean can't flip a
    * document across a bucket boundary.
    */
  val t28 = Q(
    "t28_ccnet_buckets",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val bg = bigrams(docs)
      val model = bg
        .select(split(col("bigram"), " ").getItem(0).as("w1"), col("bigram"))
        .groupBy("w1", "bigram").agg(count(lit(1)).as("n"))
        .withColumn("p_cond",
          col("n") / sum("n").over(Window.partitionBy("w1")).cast("double"))
        .select("bigram", "p_cond")
      val ce = bg.join(model, Seq("bigram"))
        .groupBy("doc_id")
        .agg(round(avg(-log(col("p_cond"))), 6).as("cross_entropy"))
      val wl = Window.partitionBy("lang")
        .orderBy(col("cross_entropy"), col("doc_id"))
      docs.select("doc_id", "lang").join(ce, Seq("doc_id"))
        .withColumn("nt", ntile(3).over(wl))
        .select(col("lang"), col("doc_id"), col("cross_entropy"),
          when(col("nt") === 1, "head").when(col("nt") === 2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy("lang", "doc_id")
    },
    Some("""with tok as (
      select doc_id, string_split(text, ' ') as t from documents
      where len(string_split(text, ' ')) >= 2
    ), bg as (
      select doc_id, t[i] || ' ' || t[i + 1] as bigram
      from (select doc_id, t, generate_subscripts(t, 1) as i from tok) s
      where i <= len(t) - 1
    ), counts as (
      select string_split(bigram, ' ')[1] as w1, bigram, count(*) as n
      from bg group by 1, 2
    ), model as (
      select bigram,
        n / cast(sum(n) over (partition by w1) as double) as p_cond
      from counts
    ), ce as (
      select b.doc_id, round(avg(-ln(m.p_cond)), 6) + 0.0 as cross_entropy
      from bg b join model m on b.bigram = m.bigram
      group by b.doc_id
    ), ranked as (
      select d.lang, c.doc_id, c.cross_entropy,
        ntile(3) over (partition by d.lang
          order by c.cross_entropy, c.doc_id) as nt
      from ce c join documents d on d.doc_id = c.doc_id
    )
    select lang, doc_id, cross_entropy,
      case nt when 1 then 'head' when 2 then 'middle' else 'tail' end as bucket
    from ranked order by lang, doc_id"""),
    "CCNet buckets: per-language head/middle/tail terciles of LM cross-entropy")

  /** Logistic quality classifier — the GPT-3-style trained-filter step
    * (Brown et al. 2020 §A; fasttext-classifier analogs in most pipeline
    * papers), with fixed literal weights standing in for the trained
    * model: p = sigmoid(w·x + b) over (stopword ratio, mean token length,
    * capped length). The keep verdict is the SIGN of the linear score —
    * all rational arithmetic evaluated in the same literal order on both
    * engines, hence bit-identical — never the sigmoid, whose libm exp()
    * can differ by an ulp cross-engine (the reported probability is
    * rounded, where an ulp can't surface). Zero-shuffle projection + the
    * output sort.
    */
  val t29 = Q(
    "t29_quality_classifier",
    (s, dir) => {
      val t = toks(col("text"))
      val nTok = size(t).cast("double")
      val nStop = size(filter(t, x => x.isInCollection(stopwords)))
        .cast("double")
      val meanTokLen =
        (length(col("text")) - (size(t) - 1)).cast("double") / nTok
      val score = lit(-1.5) + (nStop / nTok) * lit(4.0) +
        meanTokLen * lit(0.2) + least(nTok / lit(100.0), lit(1.0)) * lit(0.5)
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          round(score, 6).as("score"),
          round(lit(1.0) / (lit(1.0) + exp(-score)), 6).as("p_keep"),
          (score >= 0.0).as("keep"))
        .orderBy("doc_id")
    },
    Some(s"""with f as (
      select doc_id,
        cast(len(string_split(text, ' ')) as double) as n_tok,
        cast(len(list_filter(string_split(text, ' '),
          x -> x in (${stopwords.map("'" + _ + "'").mkString(",")})))
          as double) as n_stop,
        cast(length(text) - (len(string_split(text, ' ')) - 1) as double)
          / cast(len(string_split(text, ' ')) as double) as mean_tok_len
      from documents
    ), scored as (
      select doc_id,
        -1.5 + (n_stop / n_tok) * 4.0 + mean_tok_len * 0.2
          + least(n_tok / 100.0, cast(1.0 as double)) * 0.5 as score
      from f
    )
    select doc_id,
      round(score, 6) + 0.0 as score,
      round(1.0 / (1.0 + exp(-score)), 6) + 0.0 as p_keep,
      score >= 0.0 as keep
    from scored order by doc_id"""),
    "logistic quality classifier: sigmoid score + exact-sign keep verdict")

  /** BPE vocabulary induction, first step (Sennrich et al. 2016): corpus
    * frequencies of adjacent character pairs within words — the statistic
    * whose argmax becomes the first merge rule. A full BPE train is this
    * step iterated with re-tokenization; the per-iteration shape (explode
    * to symbol pairs, one count shuffle, global top-k) is what has to
    * scale, and the top-k rides a TakeOrdered, never a full sort. Total
    * order (count desc, pair asc) makes the cut deterministic.
    */
  val t30 = Q(
    "t30_bpe_merges",
    (s, dir) => {
      val words = Tables.documents(s, dir)
        .select(explode(toks(col("text"))).as("w"))
        .filter(length(col("w")) >= 2)
      words
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1)," +
            " i -> concat(substring(w, i, 1), substring(w, i + 1, 1)))"))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(20)
    },
    Some("""with w as (
      select unnest(string_split(text, ' ')) as w from documents
    ), p as (
      select substr(w, i, 1) || substr(w, i + 1, 1) as pair
      from (select w, unnest(range(1, length(w))) as i from w) s
    )
    select pair, count(*) as n from p group by pair
    order by n desc, pair limit 20"""),
    "BPE induction: top-20 adjacent character-pair frequencies (first merge step)")

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per-document
    * log-importance sum(ln p_target(w) − ln p_general(w)) under add-one
    * unigram models, target = lang 'en', general = whole corpus, then a
    * deterministic top-100 selection on the ROUNDED weight (rank ties
    * broken by doc_id so both engines cut identically). One token explode
    * builds the shared vocabulary model; the scoring join moves tokens
    * once on the word key; the totals ride a 3-number broadcast. The
    * global pick_rank is [[graft.ops.Ranks.globalRowNumber]] — a range-
    * partitioned parallel sort + zipWithIndex, NOT a single-partition
    * window, so ranking the whole corpus stays distributed at 100 TB.
    */
  val t32 = Q(
    "t32_dsir_weights",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val tokens = docs.select(col("doc_id"), col("lang"),
        explode(toks(col("text"))).as("w"))
      val model = tokens.groupBy("w").agg(
        count(lit(1)).as("n_all"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_tgt"))
      val tot = model.agg(
        sum("n_all").as("big_n_all"), sum("n_tgt").as("big_n_tgt"),
        count(lit(1)).as("vocab"))
      val perTok =
        log((col("n_tgt") + lit(1.0)) / (col("big_n_tgt") + col("vocab"))) -
          log((col("n_all") + lit(1.0)) / (col("big_n_all") + col("vocab")))
      val scored = tokens.join(model, Seq("w"))
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(sum(perTok), 6).as("log_weight"))
      graft.ops.Ranks.globalRowNumber(
          docs.select("doc_id", "lang").join(scored, Seq("doc_id")),
          Seq(col("log_weight").desc, col("doc_id")), "pick_rank")
        .withColumn("selected", col("pick_rank") <= 100)
        .select("doc_id", "lang", "n_tokens", "log_weight", "pick_rank",
          "selected")
        .orderBy("doc_id")
    },
    Some("""with tokens as (
      select doc_id, lang, unnest(string_split(text, ' ')) as w
      from documents
    ), model as (
      select w, count(*) as n_all,
        sum(case when lang = 'en' then 1 else 0 end) as n_tgt
      from tokens group by w
    ), tot as (
      select sum(n_all) as big_n_all, sum(n_tgt) as big_n_tgt,
        count(*) as vocab
      from model
    ), scored as (
      select t.doc_id, count(*) as n_tokens,
        round(sum(
          ln((m.n_tgt + 1.0) / (tt.big_n_tgt + tt.vocab)) -
          ln((m.n_all + 1.0) / (tt.big_n_all + tt.vocab))), 6) + 0.0
          as log_weight
      from tokens t join model m on t.w = m.w cross join tot tt
      group by t.doc_id
    )
    select d.doc_id, d.lang, s.n_tokens, s.log_weight,
      row_number() over (order by s.log_weight desc, d.doc_id) as pick_rank,
      row_number() over (order by s.log_weight desc, d.doc_id) <= 100
        as selected
    from documents d join scored s using (doc_id)
    order by d.doc_id"""),
    "DSIR importance weights: add-one unigram log-ratio + deterministic top-100 cut")

  /** Token-level Shannon entropy per document — the continuous
    * generalization of t26's distinct-ratio/top-mass repetition rules: a
    * low-entropy doc is dominated by few token types (boilerplate, spam
    * keyword stuffing), a max-entropy doc never repeats one. Zero-shuffle:
    * the whole computation is codegen'd array HOFs inside one projection
    * (counts via distinct×filter — O(n·d) per doc on ~60-token docs; a
    * corpus-scaled variant would explode+count, paying one shuffle).
    * Determinism: the per-type counts are SORTED before the entropy fold,
    * so both engines add identical terms in identical order; equal counts
    * contribute equal addends, so peer order inside the sort can't change
    * the sum. `entropy_ratio` normalizes by ln(n) (the max achievable when
    * every token is distinct); the keep gate thresholds the round-6 value
    * so membership can't flip on a last-ulp double.
    */
  val t36 = Q(
    "t36_token_entropy",
    (s, dir) => {
      val t = toks(col("text"))
      val n = size(t).cast("double")
      val cnts = array_sort(
        transform(array_distinct(t), x => size(filter(t, y => y === x))))
      val ent = -aggregate(cnts, lit(0.0),
        (acc, c) => acc + (c.cast("double") / n) * log(c.cast("double") / n))
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(t).as("n_tokens"),
          round(ent, 6).as("token_entropy"),
          when(n > 1.0, round(ent / log(n), 6)).otherwise(lit(0.0))
            .as("entropy_ratio"))
        .withColumn("keep",
          (col("token_entropy") >= 2.0) && (col("entropy_ratio") >= 0.5))
        .orderBy("doc_id")
    },
    Some("""with t as (
      select doc_id, string_split(text, ' ') as toks from documents
    ), c as (
      select doc_id, cast(len(toks) as double) as n,
        list_sort(list_transform(list_distinct(toks),
          x -> len(list_filter(toks, y -> y = x)))) as cnts
      from t
    ), e as (
      select doc_id, n,
        -list_sum(list_transform(cnts,
          c -> (c / n) * ln(c / n))) as ent
      from c
    )
    select doc_id, cast(n as int) as n_tokens,
      round(ent, 6) + 0.0 as token_entropy,
      case when n > 1 then round(ent / ln(n), 6) + 0.0
           else 0.0 end as entropy_ratio,
      (round(ent, 6) + 0.0 >= 2.0)
        and (case when n > 1 then round(ent / ln(n), 6) + 0.0
             else 0.0 end >= 0.5) as keep
    from e
    order by doc_id"""),
    "token-entropy quality gate: zero-shuffle Shannon entropy per doc")

  /** BPE tokenizer APPLY — the second half of the t30 induction step: take
    * the learned merge table and re-tokenize the corpus with it, the
    * everyday operation of every LLM data pipeline (tokenize-and-count
    * before packing/pricing a training run).
    *
    * The merge ranks (t30's top-20 pair statistics, ordered count desc /
    * pair asc) are staged once; both engines then apply them in rank order
    * (learn/apply kernels in [[graft.ops.Bpe]], shared with ScaleCheck's
    * bpe leg).
    * The segmentation kernel is PURE column expressions — no UDF, no
    * mapPartitions: a document is lifted to a delimited symbol string
    * (every char wrapped as ␁c␂), and one merge pass IS `replace(s,
    * '␁a␂␁b␂', '␁ab␂')` — `replace` scans left-to-right over
    * non-overlapping occurrences in both Spark (`UTF8String.replace`) and
    * DuckDB, which is exactly BPE's within-pass greedy semantics, and the
    * ␁/␂ token delimiters make "a ends a token AND b is the whole next
    * token" a plain substring match (no partial-token false merges).
    * The 20-rule cascade is a `aggregate()` fold over the broadcast merge
    * array — per-row work is rules × doc length, embarrassingly parallel,
    * no shuffle until the count aggregations.
    *
    * Output: per-doc token count / type count and the doc's dominant token
    * with its corpus vocabulary id. Vocabulary ids come from a sorted
    * vocab ARRAY (freq desc, token asc) built by `sort_array(collect_list)`
    * over the tiny post-merge vocabulary (≤ alphabet + 20 merges) —
    * deliberately NOT a corpus-global row_number window. Word boundaries
    * need no special casing: spaces become ␁ ␂ symbols no rule ever
    * matches. Oracle: a recursive CTE replays the same 20 replaces in rank
    * order from the same staged merge table.
    */
  /** Interpolated Kneser-Ney bigram perplexity per document — the
    * production form of LM-based quality filtering (public literature:
    * Kneser & Ney 1995; the CCNet pipeline filters on exactly this style
    * of LM perplexity). t23 scores documents with the MLE conditional
    * model; KN replaces raw MLE with absolute discounting (D = 0.75)
    * interpolated with the CONTINUATION unigram
    * `P_cont(w2) = |distinct left contexts of w2| / |bigram types|` — the
    * smoothing that makes an LM score usable on text the raw counts
    * under-represent. Scale shape: the model is three hash aggregations
    * over bigram TYPES (c(w1 w2), per-w1 totals + follower-type counts,
    * per-w2 context-type counts) + one scalar type count broadcast; the
    * per-doc pass is one bigram-keyed join + per-doc aggregate — no
    * windows, no quadratic step. Both engines compute the probability
    * with the identical expression tree (integer counts in, one double
    * expression out), so only the per-doc mean needs the round-before-
    * output discipline.
    */
  val t38 = Q(
    "t38_kneser_ney",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val bg = bigrams(docs).persist()
      val types = bg
        .select(split(col("bigram"), " ").getItem(0).as("w1"),
          split(col("bigram"), " ").getItem(1).as("w2"), col("bigram"))
        .groupBy("w1", "w2", "bigram").agg(count(lit(1)).as("c12"))
      val left = types.groupBy("w1")
        .agg(sum("c12").as("c1"), count(lit(1)).as("n1f"))
      val right = types.groupBy("w2").agg(count(lit(1)).as("n1b"))
      val totalTypes = broadcast(
        types.agg(count(lit(1)).cast("double").as("tt")))
      val model = types
        .join(left, "w1").join(right, "w2").crossJoin(totalTypes)
        .select(col("bigram"),
          ((greatest(col("c12").cast("double") - lit(0.75), lit(0.0)) +
            lit(0.75) * col("n1f") * (col("n1b") / col("tt"))) / col("c1"))
            .as("p"))
      bg.join(model, "bigram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          graft.Norm.rz(exp(avg(-log(col("p")))), 4).as("kn_perplexity"))
        .orderBy("doc_id")
    },
    Some("""with tok as (
      select doc_id, string_split(text, ' ') as t from documents
      where len(string_split(text, ' ')) >= 2
    ), bg as (
      select doc_id, t[i] || ' ' || t[i + 1] as bigram
      from (select doc_id, t, generate_subscripts(t, 1) as i from tok) s
      where i <= len(t) - 1
    ), types as (
      select string_split(bigram, ' ')[1] as w1,
        string_split(bigram, ' ')[2] as w2, bigram, count(*) as c12
      from bg group by 1, 2, 3
    ), lft as (
      select w1, sum(c12) as c1, count(*) as n1f from types group by w1
    ), rgt as (
      select w2, count(*) as n1b from types group by w2
    ), total as (
      select count(*)::double as tt from types
    ), model as (
      select t.bigram,
        (greatest(t.c12::double - 0.75, 0.0) +
          0.75 * l.n1f * (r.n1b / total.tt)) / l.c1 as p
      from types t
      join lft l using (w1)
      join rgt r using (w2)
      cross join total
    )
    select b.doc_id, count(*) as n_bigrams,
      round(exp(avg(-ln(m.p))), 4) + 0.0 as kn_perplexity
    from bg b join model m using (bigram)
    group by b.doc_id
    order by b.doc_id"""),
    "text: interpolated Kneser-Ney bigram perplexity per doc (LM quality filter)")

  val t37 = Q(
    "t37_bpe_apply",
    (s, dir) => {
      // t30's merge statistic, staged as the shared merge table; the
      // learn/apply kernels live in ops.Bpe (shared with ScaleCheck).
      val staged = graft.Stage.through(
        graft.ops.Bpe.mergeStats(Tables.documents(s, dir), "text", 20),
        dir, "t37_merges")
      // repartitionTo: the test parquet is one unsplittable row group, so
      // the fold needs an explicit fan-out to use the machine (see Bpe).
      val docTokens = graft.ops.Bpe.applyTokens(
        Tables.documents(s, dir), "text", staged,
        repartitionTo = s.sparkContext.defaultParallelism)
      val perDocTok = docTokens.groupBy("doc_id", "token")
        .agg(count(lit(1)).as("cnt"))
      val perDoc = perDocTok.groupBy("doc_id")
        .agg(sum("cnt").as("n_tokens"), count(lit(1)).as("n_types"))
      val top = perDocTok
        .withColumn("rn", row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("cnt").desc, col("token"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("token").as("top_token"),
          col("cnt").as("top_n"))
      // Corpus vocabulary as a sorted array (freq desc, token asc); the
      // token's 1-based position is its id. Bounded by construction:
      // |vocab| ≤ distinct chars + 20 merge products. Derived from
      // perDocTok (vn = sum of per-doc counts ≡ occurrence count) rather
      // than docTokens so the whole query shares ONE (doc_id, token)
      // exchange — the docTokens spelling re-ran the BPE fold a second
      // time for the vocabulary branch (r14; fold = rules × corpus chars,
      // the query's dominant CPU at any scale).
      val vocab = perDocTok.groupBy("token").agg(sum("cnt").as("vn"))
        .agg(sort_array(collect_list(
          struct((-col("vn")).as("negn"), col("token").as("t")))).as("v"))
      perDoc.join(top, "doc_id")
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          col("top_token"), col("top_n"),
          expr("array_position(transform(v, x -> x.t), top_token)")
            .as("top_token_id"))
        .orderBy("doc_id")
    },
    Some(s"""with recursive m as (
      select pair, row_number() over (order by n desc, pair) as rank
      from ${graft.Stage.sqlPath("t37_merges")}
    ), seg as (
      select doc_id,
        regexp_replace(text, '(.)', chr(1) || '\\1' || chr(2), 'g') as s,
        0 as k
      from documents
      union all
      select seg.doc_id,
        replace(seg.s,
          chr(1) || substr(m.pair, 1, 1) || chr(2)
            || chr(1) || substr(m.pair, 2, 1) || chr(2),
          chr(1) || m.pair || chr(2)),
        seg.k + 1
      from seg join m on m.rank = seg.k + 1
    ), tok as (
      select doc_id, t
      from (select doc_id,
              unnest(string_split(
                substr(s, 2, greatest(length(s) - 2, 0)),
                chr(2) || chr(1))) as t
            from seg where k = (select count(*) from m)) z
      where t <> ' ' and t <> ''
    ), dt as (
      select doc_id, t, count(*) as cnt from tok group by 1, 2
    ), vocab as (
      select t, row_number() over (order by count(*) desc, t) as tid
      from tok group by t
    ), top as (
      select doc_id, t as top_token, cnt as top_n
      from (select doc_id, t, cnt,
              row_number() over (partition by doc_id
                                 order by cnt desc, t) as rn
            from dt) z
      where rn = 1
    ), agg as (
      select doc_id, cast(sum(cnt) as bigint) as n_tokens,
        count(*) as n_types
      from dt group by 1
    )
    select a.doc_id, a.n_tokens, a.n_types, t.top_token, t.top_n,
      v.tid as top_token_id
    from agg a
    join top t on a.doc_id = t.doc_id
    join vocab v on v.t = t.top_token
    order by a.doc_id"""),
    "BPE apply: staged merge ranks re-tokenize the corpus as a replace-fold")
}
