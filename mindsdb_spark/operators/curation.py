"""Corpus-curation operators for the training-data pipeline: benchmark
contamination checking, stopword scrubbing, deterministic stratified
sampling, sequence packing, and embedding quantization.

These are the pipeline stages that sit between "raw crawl" and "training
mix" (the reference has no analog — its KB insert is the closest surface,
mindsdb/interfaces/knowledge_base/controller.py:647-983). Everything stays
in JVM expressions / shuffle-bounded joins so each operator scales with
executors; each has an exact DuckDB oracle twin in queries/pipeline.py.

Scale posture per operator:

* contamination — the benchmark shingle set is small by definition (eval
  sets are thousands of docs); it broadcasts, so the corpus side is one
  map-side semi-probe + per-doc aggregate, no corpus-vs-corpus join.
* stopword scrub / sampling / quantization — pure map stages.
* packing — one window over (stratum, doc order): a running token sum,
  the exact Spark shape of greedy fixed-budget sequence packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mindsdb_spark.catalog import parallelize_input
from mindsdb_spark.operators.dedup import words_expr

col = F.col


def _round6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def contamination_check(
    train_sh: DataFrame, bench_sh: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-train-doc n-gram overlap against a benchmark shingle set.

    Inputs are hashed shingle tables (id, sh) from dedup.shingle_hashes.
    Output: (id, n_sh, n_hit, contamination) where contamination =
    |shingles(doc) ∩ bench| / |shingles(doc)| — the standard "does my
    training set contain my eval set" screen (n-gram-overlap
    decontamination as popularized by the GPT-3/C4 reports).

    The benchmark side is deduped and BROADCAST (eval sets are small);
    the train side is probed map-side, then one partial-aggregated
    groupBy per doc. No shuffle of the corpus.
    """
    bench = bench_sh.select("sh").distinct()
    hit = (
        train_sh.join(F.broadcast(bench.withColumn("__hit", F.lit(1))), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_sh"),
            F.sum(F.coalesce(col("__hit"), F.lit(0))).alias("n_hit"),
        )
    )
    return hit.select(
        col(id_col),
        "n_sh",
        "n_hit",
        _round6(col("n_hit") / col("n_sh")).alias("contamination"),
    )


def stopword_scrub(
    df: DataFrame,
    stopwords: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove stopword tokens; report kept text + removal stats.

    (id, clean_text, n_tokens, n_removed, removed_ratio). One JVM
    filter-lambda over the token array — the map-stage shape of any
    token-level scrub (PII redaction swaps the predicate for regexes).
    """
    df = parallelize_input(df)
    w = words_expr(col(text_col))
    sw = [s.lower() for s in stopwords]
    kept = F.filter(w, lambda x: ~x.isin(*sw))
    n_tokens = F.size(w)
    n_removed = n_tokens - F.size(kept)
    return df.select(
        col(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        n_tokens.alias("n_tokens"),
        n_removed.alias("n_removed"),
        _round6(n_removed / n_tokens).alias("removed_ratio"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum percentage sampling.

    ``rates`` maps stratum → keep-percentage (0..100). A doc is kept iff
    md5(id) mod 100 < rate[stratum] — the hash-bucket sampling every
    data-mixing pipeline uses so reruns, engines, and workers agree on the
    sample without coordination (df.sample() is seed- AND partitioning-
    dependent, so it can never be cross-engine reproducible). Pure map
    stage; unknown strata default to rate 0.
    """
    bucket = (
        F.conv(F.substring(F.md5(col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
        % 100
    )
    rate = None
    for stratum, r in rates.items():
        branch = F.when(col(stratum_col) == stratum, F.lit(int(r)))
        rate = branch if rate is None else rate.when(col(stratum_col) == stratum, F.lit(int(r)))
    rate = rate.otherwise(F.lit(0)) if rate is not None else F.lit(0)
    return df.filter(bucket < rate)


def pack_sequences(
    tokens: DataFrame,
    budget: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
) -> DataFrame:
    """Assign documents to fixed-token-budget bins per stratum.

    (id, stratum, n_tokens, bin): bin = floor(cumulative tokens BEFORE this
    doc / budget) over docs ordered by id within the stratum — the running-
    sum formulation of greedy sequence packing (docs may straddle budget
    edges; packers that forbid it re-chunk afterwards). One window whose
    partition key is the stratum: at 100 TB the partition count is the
    stratum count, so for few giant strata pre-bucket by a coarse salt and
    pack within buckets — the bin ids stay deterministic because the order
    key is still (id).
    """
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(count_col).over(w), F.lit(0))
    return tokens.select(
        col(id_col),
        col(stratum_col),
        col(count_col),
        F.floor(cum_before / F.lit(budget)).cast("long").alias("bin"),
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric int8 quantization per vector: q = round(x / amax * 127).

    (id, amax, q) — the storage-shrink step before shipping embeddings to
    an ANN index (4 bytes → 1 byte per lane; recall loss is negligible at
    8 bits for cosine). amax ties to the float32 max-magnitude lane;
    rounding is floor(x+0.5) so both engines agree on .5 ties. Pure map
    stage over the corpus.
    """
    v = col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.transform(v, lambda x: F.floor(x / col("__amax") * 127 + 0.5).cast("int"))
    return (
        df.withColumn("__amax", amax)
        .select(
            col(id_col),
            _round6(col("__amax")).alias("amax"),
            q.alias("q"),
        )
    )


def source_mixture(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Corpus-composition report: per-source docs, tokens, token share.

    The "data mixture" table every pretraining run is configured from:
    (source, n_docs, n_tokens, avg_tokens, token_share). Token share
    divides by the corpus total carried on a single-row broadcast join —
    the per-source aggregate is one map-side-combinable groupBy over the
    (bounded) source domain, PERSISTED so the total folds from the
    source-domain-sized table instead of replaying the corpus tokenize
    (Catalyst has no cross-branch CSE). Training-data extension; no
    reference analog.
    """
    df = parallelize_input(df)
    per_doc = df.select(
        col(group_col), F.size(words_expr(col(text_col))).alias("__nt")
    )
    per_src = per_doc.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("__nt").alias("n_tokens"),
        _round6(F.avg("__nt")).alias("avg_tokens"),
    ).persist()
    total = per_src.agg(F.sum("n_tokens").alias("__total"))
    return (
        per_src.crossJoin(F.broadcast(total))
        .select(
            col(group_col),
            "n_docs",
            "n_tokens",
            "avg_tokens",
            _round6(col("n_tokens") / col("__total")).alias("token_share"),
        )
        .orderBy(group_col)
    )


# Redaction patterns: conservative, high-precision shapes (emails, phone
# numbers, IPv4, credit-card-ish digit runs). Order matters — cards before
# phones so a 16-digit run isn't half-eaten by the phone pattern.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
    ("phone", r"\+?\d{1,3}[ -.]?\(?\d{2,4}\)?[ -.]?\d{3,4}[ -.]?\d{3,4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact common PII shapes, reporting per-kind hit counts.

    (id, text_scrubbed, n_email, n_card, n_phone, n_ipv4) — every
    pretraining pipeline runs a pass like this before release. Pure map
    stage: chained JVM regexp_replace (no Python in the hot path); counts
    come from regexp_count on the ORIGINAL text so later rewrites can't
    mask earlier kinds. Training-data extension; the reference has no
    redaction surface.
    """
    df = parallelize_input(df)
    out = df.select(
        col(id_col),
        col(text_col).alias("__t"),
        *[
            F.regexp_count(col(text_col), F.lit(pat)).alias(f"n_{kind}")
            for kind, pat, _repl in PII_PATTERNS
        ],
    )
    scrubbed = col("__t")
    for _kind, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.select(
        col(id_col),
        scrubbed.alias("text_scrubbed"),
        *[col(f"n_{kind}") for kind, _p, _r in PII_PATTERNS],
    )


def split_assign(
    df: DataFrame,
    fractions: tuple[float, float, float] = (0.8, 0.1, 0.1),
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash.

    bucket = md5(id) mod 1000; thresholds at cumulative fractions. The
    same hash-bucket trick as stratified_sample: engines, reruns, and
    workers agree with no coordination and no stored split table — the
    split IS a pure function of the id. Pure map stage.
    """
    train, val, _test = fractions
    bucket = (
        F.conv(F.substring(F.md5(col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
        % 1000
    )
    t1, t2 = int(train * 1000), int((train + val) * 1000)
    return df.withColumn(
        "split",
        F.when(bucket < t1, "train").when(bucket < t2, "val").otherwise("test"),
    )


def dsir_weights(
    df: DataFrame,
    target,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights for target-domain data selection
    (Data Selection via Importance Resampling): score every document by
    the log-likelihood ratio between a smoothed unigram LM fit on the
    TARGET slice (rows where ``target`` is true) and the raw-corpus
    unigram LM. High-weight docs "look like" the target domain; selection
    is top-q by weight. Training-data extension; no reference analog.

    Spark shape: one corpus tokenize; ONE map-side-combinable token
    aggregate carries both corpus and target counts; the three scalars
    (corpus tokens N, target tokens T, vocab size V) ride a 1-row
    broadcast; tokens then re-join their frequencies (shuffle keyed on
    the token — uniform, no driver state) and the per-token log ratios
    sum per doc. Add-one smoothing over the corpus vocabulary keeps
    target-unseen tokens finite. Nothing collects; both shuffles are
    keyed and linear in corpus size — the same scale posture as
    unigram_nll (text.py).
    """
    df = parallelize_input(df)
    tok = df.select(
        col(id_col),
        F.when(target, F.lit(1)).otherwise(F.lit(0)).alias("__is_t"),
        F.explode(words_expr(col(text_col))).alias("__tok"),
        # two consumers (frequency aggregate + join-back) and no CSE across
        # them — persist marks the exploded tokens compute-once per action
    ).persist()
    tf = tok.groupBy("__tok").agg(
        F.count("*").alias("__c"), F.sum("__is_t").alias("__ct")
        # two consumers (scalar totals + join-back) and no cross-branch
        # CSE - persisting the vocab-sized count table saves a second
        # corpus-wide aggregate shuffle
    ).persist()
    totals = tf.agg(
        F.sum("__c").alias("__n"),
        F.sum("__ct").alias("__t"),
        F.count("*").alias("__v"),
    )
    scored = (
        tok.join(tf, "__tok")
        .crossJoin(F.broadcast(totals))
        .select(
            col(id_col),
            (
                F.log((col("__ct") + F.lit(1.0)) / (col("__t") + col("__v")))
                - F.log(col("__c") / col("__n"))
            ).alias("__lr"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        _round6(F.sum("__lr")).alias("weight"),
    )


def contrastive_triplets(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """(anchor, positive, negative) triplets for contrastive embedding
    training: every doc with a near-dup partner anchors a triplet whose
    positive is its most-canonical (min-id) LSH pair and whose negative is
    a deterministic hash-pick from the corpus — the standard
    training-pair mining step between dedup and representation learning.
    Training-data extension; no reference analog.

    Scale shape: positives come from the (already bounded) candidate-pair
    table; negatives join each anchor to ONE md5 bucket of the corpus
    (n_buckets dials the candidate slice, anchors x N/B rows) and keep the
    min-hash candidate — no global sort, no index, no randomness, so the
    same triplets come out of every engine, rerun, and partitioning."""
    sym = pairs.select(
        col("doc_a").alias("anchor"), col("doc_b").alias("__p")
    ).unionAll(pairs.select(col("doc_b").alias("anchor"), col("doc_a").alias("__p")))
    pos = sym.groupBy("anchor").agg(F.min("__p").alias("positive"))
    bucket_of = lambda c: (  # noqa: E731
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    cand = docs.select(
        col(id_col).alias("__cand"), bucket_of(col(id_col)).alias("__cb")
    )
    want = pos.withColumn(
        "__wb",
        F.conv(
            F.substring(F.md5(F.concat(col("anchor").cast("string"), F.lit("#neg"))), 1, 8),
            16,
            10,
        ).cast("long")
        % n_buckets,
    )
    picked = (
        want.join(cand, want["__wb"] == cand["__cb"])
        .where((col("__cand") != col("anchor")) & (col("__cand") != col("positive")))
        .withColumn(
            "__h",
            F.md5(F.concat(col("anchor").cast("string"), F.lit("#"), col("__cand").cast("string"))),
        )
        .groupBy("anchor", "positive")
        .agg(F.min_by("__cand", "__h").alias("negative"))
    )
    return picked.select(col("anchor").alias(id_col), "positive", "negative")


def boilerplate_scrub(
    df: DataFrame,
    k: int = 4,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate removal: drop text units that repeat in
    >= min_df distinct documents, reassemble the survivors in order.

    This is the paragraph-dedup stage of CCNet (Wenzek et al. 2020) and the
    line-level filter of RefinedWeb — headers, cookie banners, navigation
    chrome repeat verbatim across pages and get scrubbed while per-page
    prose survives. The unit here is a non-overlapping k-token segment
    (the fixture corpus has no newlines); on a real corpus the unit is the
    line/paragraph — same plan with split(text, '\\n') as the segment array.
    The reference has no analog (training-data extension).

    Plan shape: one posexplode, one segment-keyed document-frequency
    aggregate, one join back on the segment, one per-doc reassembly
    aggregate. Every shuffle is keyed on segments (uniformly distributed;
    a hot boilerplate segment is by definition bounded by corpus doc count
    and aggregates map-side) or on doc ids. Nothing collects; per-doc state
    is the doc's own segment list — the same bound as reading the doc.
    """
    df = parallelize_input(df)
    segs = df.select(
        col(id_col), words_expr(col(text_col)).alias("__ws")
    ).select(
        col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, cast(ceil(size(__ws) / {k}.0) as int)), "
                f"i -> concat_ws(' ', slice(__ws, (i - 1) * {k} + 1, {k})))"
            )
        ).alias("pos", "seg"),
        # two consumers (document-frequency aggregate + the join back) and
        # no cross-branch CSE — persist marks the tokenize+explode
        # compute-once per action
    ).persist()
    dfreq = segs.groupBy("seg").agg(F.countDistinct(id_col).alias("__df"))
    flagged = segs.join(dfreq, "seg")
    kept_text = F.array_join(
        F.transform(
            F.filter(
                F.array_sort(F.collect_list(F.struct("pos", "seg", "__df"))),
                lambda s: s["__df"] < F.lit(min_df),
            ),
            lambda s: s["seg"],
        ),
        " ",
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum((col("__df") >= min_df).cast("int")).cast("long").alias("n_removed"),
        kept_text.alias("clean_text"),
    )


def nb_quality(
    df: DataFrame,
    target,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Trained quality classifier in its SQL-checkable closed form: unigram
    Naive Bayes with add-one smoothing, positive class = the ``target``
    boolean expression (e.g. "docs from the curated source"). Per doc:
    log-odds = ln(D⁺/D⁻) + Σ_tokens [ln P(tok|+) − ln P(tok|−)],
    pred_target = log-odds > 0.

    This is the GPT-3/CCNet "quality filter" stage (score web docs by
    similarity to a trusted corpus) with the linear/fasttext classifier
    replaced by its counting-equivalent NB form, so the DuckDB oracle can
    reproduce training AND inference exactly. Differs from dsir_weights:
    both classes get their own smoothed LM (not target-vs-corpus ratio),
    plus the class prior, plus a hard decision.

    Same scale posture as dsir_weights: one tokenize, one token-keyed
    aggregate carrying both class counts, scalars on a 1-row broadcast,
    one token-keyed join back, one per-doc sum. Nothing collects.
    """
    df = parallelize_input(df)
    tok = df.select(
        col(id_col),
        F.when(target, F.lit(1)).otherwise(F.lit(0)).alias("__is_t"),
        F.explode(words_expr(col(text_col))).alias("__tok"),
    ).persist()
    tf = tok.groupBy("__tok").agg(
        F.count("*").alias("__c"), F.sum("__is_t").alias("__ct")
        # two consumers (scalar totals + join-back) and no cross-branch
        # CSE - persisting the vocab-sized count table saves a second
        # corpus-wide aggregate shuffle
    ).persist()
    totals = tf.agg(
        F.sum("__c").alias("__n"),
        F.sum("__ct").alias("__t"),
        F.count("*").alias("__v"),
    )
    prior = df.agg(
        F.log(
            F.sum(F.when(target, 1).otherwise(0))
            / F.sum(F.when(target, 0).otherwise(1))
        ).alias("__prior")
    )
    llr = F.log((col("__ct") + F.lit(1.0)) / (col("__t") + col("__v"))) - F.log(
        (col("__c") - col("__ct") + F.lit(1.0)) / (col("__n") - col("__t") + col("__v"))
    )
    agg = (
        tok.join(tf, "__tok")
        .crossJoin(F.broadcast(totals))
        .select(col(id_col), llr.alias("__llr"))
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_tokens"), F.sum("__llr").alias("__s"))
    )
    score = _round6(col("__s") + col("__prior"))
    return agg.crossJoin(F.broadcast(prior)).select(
        col(id_col),
        col("n_tokens"),
        score.alias("score"),
        (score > 0).alias("pred_target"),
    )


def perplexity_buckets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    exact: bool = True,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): split the
    corpus into head/middle/tail terciles by language-model NLL — the
    standard "keep the head, sample the middle, drop the tail" curation
    gate, with the cheap unigram NLL standing in for the LM.

    Scale shape: tercile THRESHOLDS come from one percentile aggregate
    collapsed to a broadcast row (no global ntile window — a corpus-wide
    ordered window would single-partition at 100 TB); the bucket label is
    then a pure map CASE. NLL is rounded to 1e-6 before the percentile so
    both engines interpolate identical doubles.

    ``exact=True`` (the oracle-parity default) uses Spark's exact
    `percentile`, whose aggregation state holds every per-DOC value — fine
    into the hundreds of millions of docs, not at billions. At that scale
    pass ``exact=False``: `approx_percentile` keeps a bounded sketch and
    the bucket boundary moves by at most the sketch error (CCNet's gate is
    a heuristic; a hair of boundary drift changes nothing downstream).
    """
    from mindsdb_spark.operators.text import unigram_nll

    nll = unigram_nll(df, text_col, id_col).select(id_col, "n_tokens", "nll")
    pfn = "percentile" if exact else "approx_percentile"
    cuts = nll.agg(
        F.expr(f"{pfn}(nll, 1.0/3.0)").alias("__t1"),
        F.expr(f"{pfn}(nll, 2.0/3.0)").alias("__t2"),
    )
    bucket = (
        F.when(col("nll") < col("__t1"), "head")
        .when(col("nll") < col("__t2"), "middle")
        .otherwise("tail")
    )
    return nll.crossJoin(F.broadcast(cuts)).select(
        col(id_col), col("n_tokens"), col("nll"), bucket.alias("ppl_bucket")
    )


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.5,
    budget: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Temperature-scaled source sampling weights: w_s ∝ p_s^alpha over the
    token shares (the multilingual/multi-source rebalancing rule — alpha<1
    upsamples small sources, the mT5/UniMax-family recipe), plus the token
    allocation each source gets from a fixed training budget.

    Everything downstream of source_mixture's one corpus pass is arithmetic
    on the |sources|-row table; the normalizer folds from a persisted copy
    of that table and rides a 1-row broadcast.
    """
    mix = source_mixture(df, text_col, id_col, group_col).persist()
    # sqrt is IEEE-correctly-rounded in BOTH engines; pow(x, 0.5) is not
    # guaranteed to be, so the canonical alpha keeps bit-exact oracle parity
    nt = col("n_tokens").cast("double")
    powed = mix.select(
        col(group_col),
        "n_tokens",
        "token_share",
        (F.sqrt(nt) if alpha == 0.5 else F.pow(nt, F.lit(alpha))).alias("__p"),
    )
    z = powed.agg(F.sum("__p").alias("__z"))
    w = col("__p") / col("__z")
    return (
        powed.crossJoin(F.broadcast(z))
        .select(
            col(group_col),
            "n_tokens",
            "token_share",
            _round6(w).alias("temp_weight"),
            F.floor(w * F.lit(float(budget)) + F.lit(0.5)).cast("long").alias("alloc_tokens"),
        )
    )


# Gopher quality-rule thresholds (Rae et al. 2021, Appendix A1.1) — the
# document-level subset that applies to single-line fixture text; the
# line-level rules (bullet starts, ellipsis line endings) need newline
# structure and activate on real corpora with the same plan shape.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style quality gate: each published rule as its own boolean
    column plus the conjunctive keep flag — the composite filter table a
    curation run materializes for auditability (why was this doc dropped?).

    Rules (document-level subset): 50 <= word count <= 100000; mean word
    length in [3, 10]; symbol-to-word ratio (# or ...) < 0.1; >= 80% of
    words contain an alphabetic character; >= 2 distinct stopword hits.
    One pure map stage over the corpus — every statistic is a HOF fold over
    the doc's own token array; zero shuffle, zero Python.
    """
    df = parallelize_input(df)
    w = words_expr(col(text_col))
    n = F.size(w)
    mean_len = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ) / n
    n_symbolish = F.size(F.filter(w, lambda x: x.contains("#") | x.contains("...")))
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    n_stop = F.size(
        F.array_intersect(F.array_distinct(w), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )
    r_count = (n >= 50) & (n <= 100000)
    r_wordlen = (mean_len >= 3.0) & (mean_len <= 10.0)
    r_symbol = (n_symbolish / n) < 0.1
    r_alpha = (n_alpha / n) >= 0.8
    r_stop = n_stop >= 2
    return df.select(
        col(id_col),
        n.cast("long").alias("n_words"),
        _round6(mean_len).alias("mean_word_len"),
        r_count.alias("ok_word_count"),
        r_wordlen.alias("ok_word_length"),
        r_symbol.alias("ok_symbol_ratio"),
        r_alpha.alias("ok_alpha_words"),
        r_stop.alias("ok_stopwords"),
        (r_count & r_wordlen & r_symbol & r_alpha & r_stop).alias("keep"),
    )
