"""Training-data pipeline operators over a documents corpus.

Beyond the reference's own operator set (SURVEY.md §2), these are the
operations a large-scale training-data pipeline needs: deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard), language ID, quality
scoring, token counting, document fingerprinting.

Design rules:
- Everything is built-in pyspark.sql.functions (JVM, codegen) — no Python
  UDFs anywhere in this module.
- All hashing is md5-hex (identical in Spark and DuckDB) so every operator
  has an exact cross-engine oracle.
- At 100 TB: exact dedup is one hash-shuffle; MinHash-LSH is the scale path
  for near-dup (candidate pairs only within LSH buckets — never the O(n²)
  cross join); n-gram Jaccard is the verifier applied to candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from katta_spark.tokenizer import tokenize_col

# Tiny deterministic stopword sets for the language-ID heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "fr": ("le", "la", "les", "de", "et", "des", "un"),
    "es": ("el", "los", "de", "y", "que", "en", "un"),
    "de": ("der", "die", "und", "das", "ist", "von", "ein"),
}
EN_STOPWORDS = LANG_STOPWORDS["en"] + ("it", "for", "on", "with", "as", "at", "by")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id, is_dup): canonical = min doc_id per md5(text).

    One groupBy-shuffle on the 32-byte hash — never on the text itself
    (at 100 TB the shuffle payload is hashes, not documents).
    """
    from pyspark.sql import Window

    h = docs.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_md5")
    )
    # canonical = min(doc_id) over the hash group as a WINDOW aggregate:
    # one corpus scan and one exchange, where the former groupBy + join
    # scanned and hashed the corpus once per join side (self-joins do not
    # share lineage) and shuffled it twice.
    return h.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("text_md5")).alias(
            "canonical_id"
        ),
    ).select(
        "doc_id",
        "canonical_id",
        (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"),
    )


def _shingle_array_col(t, n: int):
    """array<string>: the DISTINCT n-gram shingles of token array ``t``,
    entirely in-row ('' and NULL entries removed here rather than after an
    explode) — the single definition behind both the exploded
    :func:`shingles` relation and the array-form :func:`shingle_arrays`.

    ``t`` MUST be a projected column reference, never the tokenize
    expression itself: the transform lambda slices ``t`` per element, and
    higher-order functions re-evaluate a captured expression on every
    element (no CSE) — an inlined regex tokenize here costs
    len(t) regex splits per row (measured 12x on the corpus scan)."""
    raw = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.array_join(F.slice(t, i + 1, n), " "),
        ),
    ).otherwise(F.array(F.array_join(t, " ")))
    return F.filter(
        F.array_distinct(raw), lambda s: s.isNotNull() & (s != "")
    )


def shingle_arrays(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, sh: array<string>): each document's distinct shingle SET as
    one in-row array; documents with no shingles are dropped (exactly the
    docs that vanish from the exploded :func:`shingles` relation).

    The array form is what lets the MinHash family run shuffle-free:
    signatures are array_min over an in-row transform, set sizes are
    F.size, and candidate-pair Jaccard is array_intersect — none of which
    need the (doc_id, shingle) explode + re-aggregation the exploded form
    forces (at 100 TB those were full corpus exchanges).

    The no-shingle filter is expressed on the TOKEN array, not the
    shingle array (equivalent: >= 1 token <=> >= 1 non-empty shingle —
    the < n-token fallback joins the tokens into one shingle), because
    a filter on the projected shingle column would be pushed below the
    projection with the whole tokenize+transform expression substituted
    in — re-running the shingling once per row inside the filter
    (measured as a 2x tax on every consumer of this relation)."""
    toks = docs.where(
        F.size(tokenize_col(F.col(text_col))) > 0
    ).select(
        F.col(id_col).alias("doc_id"),
        tokenize_col(F.col(text_col)).alias("t"),
    )
    return toks.select(
        "doc_id", _shingle_array_col(F.col("t"), n).alias("sh")
    )


def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(doc_id, shingle): distinct n-gram token shingles per document.

    Built with sequence+transform over the token array — no explode of
    overlapping windows through Python; per-doc dedup and the ''/NULL
    filter happen IN-ROW (_shingle_array_col) before the explode, a
    whole-stage-codegen expression instead of the corpus-wide
    (doc_id, shingle) DISTINCT shuffle it replaces.

    Derived from :func:`shingle_arrays` (explode of the array form) so
    that every exploded-form consumer shares the SAME analyzed plan
    fragment as the array-form consumers: when one operator persists the
    shingle-array relation (near_dup_pairs, decontaminate_fuzzy), the
    CacheManager substitutes the cached relation into every other
    operator's shingle scan in the same session — decontaminate,
    doc_fingerprint and jaccard_pairs then explode from memory instead
    of re-tokenizing the corpus.

    explode_outer, not explode: InferFiltersFromGenerate would otherwise
    duplicate the WHOLE shingle expression into an interpreted
    pre-Generate filter (size(...) > 0), re-running the regex split and
    transform per row outside codegen — measured 5x the cost of the
    shingling itself. The rule skips outer generates; arrays here are
    non-empty with non-null elements, so no NULL rows appear."""
    return shingle_arrays(docs, n, id_col, text_col).select(
        "doc_id", F.explode_outer("sh").alias("shingle")
    )


def jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.2,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(a, b, jaccard) for pairs with n-gram Jaccard >= threshold, a < b.

    Join on shared shingle → pair intersection counts → sizes. At scale this
    runs on LSH candidates only (minhash_lsh_pairs), not the full corpus;
    here it is also the exactness oracle for the LSH path.
    """
    sh = shingles(docs, n, id_col, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("x")
    b = sh.alias("y")
    inter = (
        a.join(b, (F.col("x.shingle") == F.col("y.shingle")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a").join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _sig_exprs(sh_col, num_hashes: int) -> list:
    """h_i = min over the shingle array of md5(f'{i}|' + shingle) —
    computed IN-ROW (array_min over a transform) instead of the
    explode + 8-way min-aggregate it replaces: zero exchanges, one md5
    pass per (hash, shingle), and at 100 TB the signature step adds no
    shuffle at all. array_min's string ordering is the same UTF8 binary
    ordering as the min() aggregate, so the values are identical."""
    def _h(i: int):
        # single-arg lambda (a two-arg lambda would make F.transform bind
        # its second parameter to the ARRAY INDEX, not the closure value)
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    return [
        F.array_min(F.transform(sh_col, _h(i))) for i in range(num_hashes)
    ]


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 8, n: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, h0..h{H-1}): MinHash signature, h_i = min md5(i|shingle).

    md5-hex string minimum is order-isomorphic to a uniform hash minimum,
    and identical across engines — the cross-engine-verifiable MinHash.
    Computed entirely in-row from the shingle array (scan → project, no
    explode, no aggregation exchange)."""
    sig = _sig_exprs(F.col("sh"), num_hashes)
    return shingle_arrays(docs, n, id_col, text_col).select(
        "doc_id", *[sig[i].alias(f"h{i}") for i in range(num_hashes)]
    )


def _band_cols(sh_col, num_hashes: int, bands: int) -> list:
    rows = num_hashes // bands
    sig = _sig_exprs(sh_col, num_hashes)
    return [
        F.concat_ws(
            "#", F.lit(str(bi)), *[sig[bi * rows + r] for r in range(rows)]
        )
        for bi in range(bands)
    ]


def _lsh_pairs_from_arrays(
    arr: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """(a, b) distinct candidate pairs sharing >= 1 LSH band, a < b, from
    the (doc_id, sh) array relation.

    The banded relation is PERSISTED before the self-join: a self-join
    executes its child once per side, and exchange reuse does not fire
    across the two sides here (the HOF lambda variables defeat plan
    canonicalization), so without the persist the whole
    tokenize→shingle→8×md5 signature lineage runs twice — measured as
    the dominant cost of this operator. banded is n_docs × bands rows of
    (id, ~70-char band) — corpus-scale-tiny (the signature table, not
    the corpus), safe to cache at any size.

    explode_outer, not explode: InferFiltersFromGenerate would duplicate
    the whole 8-hash band-array expression into a pre-Generate
    size()>0 filter (outer generates skip the rule; the array is
    fixed-size so no rows are lost)."""
    from pyspark import StorageLevel

    banded = arr.select(
        "doc_id",
        F.explode_outer(
            F.array(*_band_cols(F.col("sh"), num_hashes, bands))
        ).alias("band"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame, num_hashes: int = 8, bands: int = 4, n: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(a, b) candidate near-dup pairs sharing >=1 LSH band, a < b.

    bands bands of num_hashes/bands rows each. The scale path: shuffle is
    by band bucket (small), candidate verification (jaccard_pairs) runs on
    candidates only. Signatures are in-row (_sig_exprs) and the self-join
    reuses one exchange, so the corpus is scanned once."""
    return _lsh_pairs_from_arrays(
        shingle_arrays(docs, n, id_col, text_col), num_hashes, bands
    )


def near_dup_pairs(
    docs: DataFrame, threshold: float = 0.8, num_hashes: int = 8, bands: int = 4,
    n: int = 3, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(a, b, jaccard): VERIFIED near-dup pairs — LSH candidates, then
    exact n-gram Jaccard computed ONLY on those candidates (a < b).

    This is the composed scale path: the quadratic shared-shingle join of
    jaccard_pairs never runs on the full corpus — each candidate pair's
    intersection is one in-row array_intersect of the two docs' shingle
    arrays, so cost is |candidates| x shingles/doc, not corpus².

    The shingle-ARRAY relation is computed ONCE and persisted
    (MEMORY_AND_DISK): the LSH candidate join and both sides of the
    verification join branch from the same cached relation instead of
    re-executing the tokenize lineage — at 100 TB the shingle
    materialization is the dominant scan, so the pipeline pays it once.
    Replacing the exploded cand ⋈ shingles(a) ⋈ (b, shingle) ⋈ sizes(a)
    ⋈ sizes(b) cascade (two aggregations + four joins) with two array
    joins + in-row set math removed three exchanges from the plan.
    """
    from pyspark import StorageLevel

    arr = shingle_arrays(docs, n, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cand = _lsh_pairs_from_arrays(arr, num_hashes, bands)
    sa = arr.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    sb = arr.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.join(sa, "a").join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                inter / (F.size("sh_a") + F.size("sh_b") - inter), 4
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def min_label_components(
    ids: DataFrame, pairs: DataFrame, max_iters: int = 20,
    driver_pairs_max: int | None = None,
) -> DataFrame:
    """(doc_id, canonical_id): connected components of the undirected graph
    ``pairs`` (columns a, b — node ids) over the node set ``ids`` (column
    doc_id) — per component, every node labels with the component's MIN
    node id. The shared closure engine behind text near-dup (dedup_near)
    and embedding near-dup (similarity.embedding_dedup) canonicalization.

    Fast path: the edge set of a dedup graph is tiny relative to the
    corpus (only near-duplicate pairs), so when it fits the driver budget
    (``driver_pairs_max`` rows, default $KATTA_CC_DRIVER_PAIRS_MAX or
    2,000,000 — a bounded limit+collect, never an unbounded pull) the
    components come from ONE driver union-find and apply as a broadcast
    (node → canonical) join with coalesce(own id) for untouched nodes —
    replacing 2 Spark jobs per propagation round (the checkpointing join
    + the convergence count) with one collect. The result is the exact
    fixpoint the iterative loop converges to (union-find is the oracle
    the loop is property-tested against). Past the budget, the iterative
    min-label propagation below runs unchanged — converging in
    graph-diameter rounds (each round one join + one min-agg; lineage
    cut per round via localCheckpoint)."""
    import os

    if driver_pairs_max is None:
        driver_pairs_max = int(
            os.environ.get("KATTA_CC_DRIVER_PAIRS_MAX", "2000000")
        )
    if driver_pairs_max > 0:
        head = pairs.select("a", "b").limit(driver_pairs_max + 1).collect()
        if len(head) <= driver_pairs_max:
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for r_ in head:
                ra, rb = find(r_["a"]), find(r_["b"])
                if ra != rb:
                    # roots union with the MIN kept as the new root, so
                    # find(node) is directly the component's min label
                    parent[max(ra, rb)] = min(ra, rb)
            mapping = sorted((n, find(n)) for n in set(parent))
            spark = ids.sparkSession
            dt = dict(ids.dtypes)["doc_id"]
            map_df = spark.createDataFrame(
                mapping, schema="doc_id long, canonical_id long"
            ).select(
                F.col("doc_id").cast(dt), F.col("canonical_id").cast(dt)
            )
            return ids.select("doc_id").join(
                F.broadcast(map_df), "doc_id", "left"
            ).select(
                "doc_id",
                F.coalesce("canonical_id", "doc_id").alias("canonical_id"),
            )
    # undirected edges, both directions
    edges = pairs.select("a", "b").unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).cache()
    labels = ids.select(
        F.col("doc_id"), F.col("doc_id").alias("canonical_id")
    ).cache()
    for _ in range(max_iters):
        # candidate label per node = min(own, min over neighbors' labels)
        neigh = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("b"),
                    F.col("canonical_id").alias("nb_label"),
                ),
                "b",
            )
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("nb_label").alias("nb_min"))
        )
        new_labels = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("canonical_id"),
                    F.coalesce(F.col("nb_min"), F.col("canonical_id")),
                ).alias("canonical_id"),
            )
            .localCheckpoint()  # cut the iterative lineage
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("canonical_id", "old"), "doc_id")
            .where(F.col("canonical_id") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("doc_id", "canonical_id")


def dedup_near(
    docs: DataFrame, threshold: float = 0.8, num_hashes: int = 8, bands: int = 4,
    n: int = 3, id_col: str = "doc_id", text_col: str = "text",
    max_iters: int = 20,
) -> DataFrame:
    """(doc_id, canonical_id, is_dup): canonical assignment over the
    TRANSITIVE CLOSURE of verified near-dup pairs (connected components via
    min_label_components).

    The closure is iterative dataflow DuckDB SQL can't express with plain
    aggregates, so the gate covers near_dup_pairs and the closure is
    property-tested against a union-find oracle (tests/test_textops.py).
    """
    pairs = near_dup_pairs(
        docs, threshold, num_hashes, bands, n, id_col, text_col
    ).select("a", "b")
    labels = min_label_components(
        docs.select(F.col(id_col).alias("doc_id")), pairs, max_iters
    )
    return labels.select(
        "doc_id",
        "canonical_id",
        (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"),
    )


def substring_dup_spans(
    docs: DataFrame, k: int = 50, min_count: int = 2,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_dup_tokens, dup_token_frac, n_dup_spans):
    exact SUBSTRING-duplication profile — the ExactSubstr rule of Lee et
    al. 2021 ("Deduplicating Training Data Makes Language Models Better"):
    any token span of length >= k whose content occurs >= min_count times
    anywhere in the corpus (across documents OR repeated within one) is
    duplicated. Complements the whole-document families (exact_dedup /
    minhash / simhash): it catches the document that is unique overall but
    half boilerplate.

    Per doc: n_dup_tokens = |union of [pos, pos+k) over duplicated k-gram
    starts| (overlapping hits merge — each token is counted once),
    n_dup_spans = number of merged maximal spans, dup_token_frac =
    n_dup_tokens / n_tokens. Every document gets a row (zero-hit docs
    included) — the output is a per-doc verdict feeding a drop/trim rule.
    Span REMOVAL is deliberately not done here: the paper edits raw bytes,
    while this engine's analysis chain is token-level (tokenize_col is
    lossy), so the honest operator reports exact token spans and lets the
    caller drop or trim.

    100-TB shape (suffix arrays don't distribute; positional k-gram
    hashing is the standard Spark re-expression): one row per token
    position (doc_id, pos, h=xxhash64(k-gram)) — grams materialize as
    8-byte hashes, never strings, so the exchanges move fixed-width rows
    exactly like the index build's token shuffle. The gram relation is
    computed once and persisted; corpus-wide occurrence counts collapse
    map-side before their exchange (partial agg on h); the join back is a
    hash join on h (both sides corpus-sized — no broadcast assumption);
    the interval union + span count is ONE in-row aggregate() sweep over
    the per-doc sorted start array (O(hits log hits) per doc, no
    explode-by-k blowup of covered positions). Hash collisions
    (~grams²/2⁶⁴ birthday risk) can only over-mark, same exposure as the
    index term dictionary, where it is measured and checked.
    """
    from pyspark import StorageLevel

    if k < 1 or min_count < 1:
        raise ValueError("k and min_count must be >= 1")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_col(F.col(text_col)).alias("t")
    )
    base = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    gram_structs = F.when(
        F.size("t") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - k),
            lambda i: F.struct(
                i.cast("long").alias("pos"),
                F.xxhash64(
                    F.array_join(F.slice(F.col("t"), i + 1, k), " ")
                ).alias("h"),
            ),
        ),
    )
    # explode_outer + isNotNull: see shingles() — avoids the inferred
    # pre-Generate filter re-running the tokenize + transform per row.
    g = (
        toks.select("doc_id", F.explode_outer(gram_structs).alias("g"))
        .where(F.col("g").isNotNull())
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dup_h = (
        g.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
        .select("h")
    )
    occ = g.join(dup_h, "h").select("doc_id", "pos")
    kl = F.lit(k).cast("long")
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        F.lit(-1).cast("long").alias("end"),
        zero.alias("cov"),
        zero.alias("spans"),
    )

    def _step(acc, s):
        # intervals are [s, s+k); a start at exactly acc.end begins a NEW
        # span (no token overlap); covered adds only the part past acc.end
        return F.struct(
            F.greatest(acc["end"], s + kl).alias("end"),
            (
                acc["cov"]
                + F.greatest(zero, s + kl - F.greatest(acc["end"], s))
            ).alias("cov"),
            (
                acc["spans"]
                + F.when(s >= acc["end"], F.lit(1)).otherwise(F.lit(0)).cast("long")
            ).alias("spans"),
        )

    prof = (
        occ.groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("pos")).alias("starts"))
        .select("doc_id", F.aggregate("starts", acc0, _step).alias("p"))
        .select(
            "doc_id",
            F.col("p.cov").alias("n_dup_tokens"),
            F.col("p.spans").alias("n_dup_spans"),
        )
    )
    return base.join(prof, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_dup_tokens", zero).alias("n_dup_tokens"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce("n_dup_tokens", zero).cast("double")
                / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("dup_token_frac"),
        F.coalesce("n_dup_spans", zero).alias("n_dup_spans"),
    )


def simhash16(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 16-bit SimHash as a bitstring.

    Bit j = sign of the tf-weighted sum of (high bit of nibble j of
    md5(term)) — per-nibble high bit is '8'-'f' in hex, exact in any engine.
    """
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), tokenize_col(F.col(text_col)).alias("t"))
        # explode_outer + isNotNull: see shingles() — avoids the
        # inferred pre-Generate filter re-running the tokenize per row
        .select("doc_id", F.explode_outer("t").alias("term"))
        .where(F.col("term").isNotNull())
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.md5("term"))
    )
    bit_aggs = []
    for j in range(1, 17):
        is_one = F.substring("h", j, 1).isin("8", "9", "a", "b", "c", "d", "e", "f")
        bit_aggs.append(
            F.when(
                F.sum(F.when(is_one, F.col("tf")).otherwise(-F.col("tf"))) >= 0, "1"
            )
            .otherwise("0")
            .alias(f"b{j}")
        )
    return tf.groupBy("doc_id").agg(
        F.concat(*bit_aggs).alias("simhash")
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred): stopword-overlap language heuristic.

    Deterministic argmax with fixed tie order en > fr > es > de > und.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_col(F.col(text_col)).alias("t")
    )
    hit_cols = {
        lang: F.size(F.array_intersect(F.col("t"), F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_STOPWORDS.items()
    }
    scored = toks.select("doc_id", *[c.alias(f"hits_{l}") for l, c in hit_cols.items()])
    best = F.greatest(*[F.col(f"hits_{l}") for l in LANG_STOPWORDS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_STOPWORDS:  # fixed order = tie-break
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return scored.select("doc_id", pred.alias("lang_pred"))


# BPE-ish pre-tokenization pattern (GPT-2 style splitting, simplified to
# an engine-portable core): letter runs, digit runs, or single
# non-alphanumeric non-space marks — the unit count a byte-pair encoder
# would start from. Identical regex semantics in Spark and DuckDB.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens): whitespace token count and a
    BPE-ish pre-token count — the two budget numbers a training pipeline
    tracks per document (data mixing, context packing). All JVM regex.
    """
    ws = F.size(
        F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != "")
    )
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, stopword_ratio, alnum_ratio).

    The classic cheap quality signals, all exact-arithmetic + round(4).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        tokenize_col(F.col(text_col)).alias("t"),
    )
    n_tokens = F.size("t")
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(F.col("t"), lambda x: F.array_contains(sw, x)))
    token_chars = F.aggregate(
        F.transform(F.col("t"), lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return toks.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(
            F.when(n_tokens > 0, token_chars.cast("double") / n_tokens).otherwise(0.0), 4
        ).alias("avg_token_len"),
        F.round(
            F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(
                F.length("text") > 0,
                token_chars.cast("double") / F.length("text"),
            ).otherwise(0.0),
            4,
        ).alias("alnum_ratio"),
    )


def decontaminate(
    docs: DataFrame, bench: DataFrame, n: int = 3, min_hits: int = 1,
    id_col: str = "doc_id", text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hit_shingles, contaminated): benchmark-overlap flagging.

    The eval-set decontamination pass every training pipeline runs before
    a model sees the corpus: a document is contaminated when >= min_hits
    of its distinct n-gram shingles appear in the benchmark/eval set
    (the GPT-3 appendix-C / Dolma n-gram-overlap rule).

    100-TB shape: the benchmark side is eval-set-sized (thousands of
    rows), so its distinct n-grams BROADCAST; the corpus side never
    shuffles for the probe — document shingles explode in place, the
    broadcast hash join marks hits row-locally, and the per-doc count
    collapses map-side (explode keeps a doc's shingles inside one
    partition, so the partial aggregate emits ~one row per document into
    the single exchange). Documents with zero hits are kept (count 0) —
    the output is a per-doc verdict, not a hit list.
    """
    doc_sh = shingles(docs, n, id_col, text_col)
    bench_sh = (
        bench.select(tokenize_col(F.col(bench_text_col)).alias("t"))
        .select(
            F.explode_outer(
                F.when(
                    F.size("t") >= n,
                    F.transform(
                        F.sequence(F.lit(0), F.size("t") - n),
                        lambda i: F.array_join(F.slice(F.col("t"), i + 1, n), " "),
                    ),
                ).otherwise(F.array(F.array_join(F.col("t"), " ")))
            ).alias("shingle")
        )
        .where(F.col("shingle") != "")
        .distinct()
        .withColumn("hit", F.lit(1).cast("long"))
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit_shingles"))
        .select(
            "doc_id",
            "n_hit_shingles",
            (F.col("n_hit_shingles") >= min_hits).alias("contaminated"),
        )
    )


def decontaminate_fuzzy(
    docs: DataFrame, bench: DataFrame, threshold: float = 0.5,
    num_hashes: int = 8, bands: int = 4, n: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
    bench_id_col: str = "doc_id", bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, contaminated, jaccard, bench_id): FUZZY eval-set
    decontamination — a document is contaminated when its n-gram Jaccard
    similarity to SOME benchmark document reaches ``threshold`` (the
    near-duplicate companion of the exact n-gram-overlap rule in
    :func:`decontaminate`; Dolma/Llama pipelines run both — paraphrased
    or lightly-edited eval documents defeat exact overlap counting).

    Per input doc exactly one row: its best verified benchmark match
    (highest Jaccard, ties to the smallest bench_id) or NULLs when no LSH
    candidate verified (jaccard 0.0, contaminated false).

    100-TB shape: the benchmark side is eval-set-sized, so its banded
    MinHash table and its shingle ARRAYS broadcast; the corpus side
    computes signatures IN-ROW from ONE persisted shingle-array relation
    and probes the broadcast bands row-locally — the corpus never
    shuffles. Exact Jaccard verification runs ONLY on LSH candidates,
    as one in-row array_intersect per candidate against the broadcast
    benchmark arrays — the same candidates-only discipline as
    :func:`near_dup_pairs`, minus the explode/re-aggregate exchanges.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    from pyspark import StorageLevel

    doc_arr = shingle_arrays(docs, n, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bench_arr = shingle_arrays(bench, n, bench_id_col, bench_text_col).select(
        F.col("doc_id").alias("bench_id"), F.col("sh").alias("sh_b")
    )

    def _banded(arr: DataFrame, idc: str, shc: str) -> DataFrame:
        # explode_outer: see _lsh_pairs_from_arrays (InferFilters dodge)
        return arr.select(
            idc,
            F.explode_outer(
                F.array(*_band_cols(F.col(shc), num_hashes, bands))
            ).alias("band"),
        )

    bench_bands = _banded(bench_arr, "bench_id", "sh_b")
    cand = (
        _banded(doc_arr, "doc_id", "sh")
        .join(F.broadcast(bench_bands), "band")
        .select("doc_id", "bench_id")
        .distinct()
    )
    # exact verification on candidates only: attach the corpus doc's
    # shingle array (persisted relation) and the benchmark doc's array
    # (broadcast), intersect in-row
    inter = F.size(F.array_intersect("sh", "sh_b"))
    verified = (
        cand.join(doc_arr, "doc_id")
        .join(F.broadcast(bench_arr), "bench_id")
        .withColumn(
            "jaccard",
            F.round(inter / (F.size("sh") + F.size("sh_b") - inter), 4),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("jaccard").desc(), F.col("bench_id").asc()
    )
    best = (
        verified.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("doc_id", "jaccard", "bench_id")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.coalesce(F.col("jaccard"), F.lit(0.0)) >= threshold
            ).alias("contaminated"),
            F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("jaccard"),
            "bench_id",
        )
    )


def _grams_col(t, n: int):
    # Non-distinct positional n-grams (unlike shingles(), repetition cares
    # about every occurrence); < n tokens -> empty list, not a fallback.
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.array_join(F.slice(t, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_scores(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(doc_id, n_2grams, dup_2gram_frac, dup_3gram_frac, top_2gram_frac).

    Gopher/MassiveText repetition quality signals (Rae et al. 2021,
    appendix A1.1): the fraction of 2-/3-gram occurrences that are
    duplicates of an earlier occurrence, and the fraction of all 2-gram
    occurrences taken by the single most frequent 2-gram. Boilerplate,
    keyword-stuffed, and looping documents score high; clean prose low.

    Everything is an in-row whole-stage-codegen expression — grams via
    sequence+transform, duplicate fractions via array_distinct, the top
    2-gram occupancy via array_sort + a single aggregate() run-length
    sweep (O(L log L) per document) — so the operator adds ZERO exchanges
    to the plan at any corpus size.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_col(F.col(text_col)).alias("t")
    )
    g = toks.select(
        "doc_id",
        _grams_col(F.col("t"), 2).alias("g2"),
        _grams_col(F.col("t"), 3).alias("g3"),
    )

    def dup_frac(col):
        nn = F.size(col)
        return F.round(
            F.when(
                nn > 0,
                F.lit(1.0) - F.size(F.array_distinct(col)).cast("double") / nn,
            ).otherwise(0.0),
            4,
        )

    n2 = F.size("g2")
    return g.select(
        "doc_id",
        n2.cast("long").alias("n_2grams"),
        dup_frac(F.col("g2")).alias("dup_2gram_frac"),
        dup_frac(F.col("g3")).alias("dup_3gram_frac"),
        _top_gram_frac_col(F.col("g2")).alias("top_2gram_frac"),
    )


def _top_gram_frac_col(g2):
    """Rounded fraction of all 2-gram occurrences taken by the single most
    frequent 2-gram — shared by repetition_scores and curate (rule 2), so
    the two compute bit-identical values from one definition.

    Longest equal run in the sorted gram list == max occurrence count.
    Grams are never '' (tokens are non-empty), so '' is a safe initial
    "previous" sentinel."""

    def _step(acc, x):
        run = (
            F.when(x == acc["prev"], acc["run"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_count = F.aggregate(
        F.array_sort(g2),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        _step,
        lambda acc: acc["best"],
    )
    n2 = F.size(g2)
    return F.round(
        F.when(n2 > 0, top_count.cast("double") / n2).otherwise(0.0), 4
    )


def _exploded_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, tok): one row per token OCCURRENCE (non-distinct).

    explode_outer + filter, not explode: InferFiltersFromGenerate would
    otherwise duplicate the tokenize regex into an interpreted
    pre-Generate filter (see shingles()). Empty docs vanish (no tokens).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_col(F.col(text_col)).alias("t")
    )
    return toks.select("doc_id", F.explode_outer("t").alias("tok")).where(
        F.col("tok") != ""
    )


def unigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(doc_id, n_tokens, cross_entropy, perplexity, min_logp).

    LM-perplexity quality filtering — the CCNet / LLaMA-pipeline signal
    (Wenzek et al. 2019 train a KenLM and keep the low-perplexity tail) —
    re-expressed with a corpus-derived UNIGRAM LM, the strongest model
    expressible without an external artifact: p(t) = corpus_count(t) /
    corpus_total; per document over its token OCCURRENCES,
    cross_entropy = -mean ln p(t) (nats), perplexity = exp(ce), and
    min_logp = the most surprising token's ln p. Rare-token-heavy or
    garbled documents score high; repetitive boilerplate scores low.

    100-TB shape: the classic two-pass train/apply split. Pass 1 is a
    vocab-sized groupBy(token) count — partial aggregation collapses the
    corpus-sized explode map-side, so the exchange carries ~vocab rows;
    the corpus total rides a broadcast 1-row aggregate (no driver
    round-trip). Pass 2 joins token→logp — broadcast by default
    (natural-language vocab is millions of rows, well under executor
    memory; set broadcast_vocab=False past ~1e8 terms to let AQE pick a
    shuffle-hash join) — so the corpus side keeps its partitioning and
    the per-doc collapse again combines map-side: one row per document
    enters the final exchange. Documents with zero tokens are dropped
    (a perplexity of nothing is undefined, matching CCNet which skips
    empty lines).
    """
    from pyspark import StorageLevel

    # One tokenize+explode, persisted: the vocab-count pass (train) and
    # the logp-join pass (apply) are the only two consumers, and without
    # the persist each re-runs the regex tokenize over the whole corpus.
    tok = _exploded_tokens(docs, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    uni = tok.groupBy("tok").agg(F.count("*").alias("c"))
    total = uni.agg(F.sum("c").cast("double").alias("tot"))
    lp = uni.crossJoin(F.broadcast(total)).select(
        "tok", F.log(F.col("c") / F.col("tot")).alias("logp")
    )
    if broadcast_vocab:
        lp = F.broadcast(lp)
    return (
        tok.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (-F.avg("logp")).alias("_ce"),
            F.min("logp").alias("_min_logp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round("_ce", 4).alias("cross_entropy"),
            F.round(F.exp("_ce"), 4).alias("perplexity"),
            F.round("_min_logp", 4).alias("min_logp"),
        )
    )


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    alpha: float = 1.0, broadcast_stats: bool = True,
) -> DataFrame:
    """(doc_id, n_tokens, cross_entropy, perplexity, min_logp).

    The order-2 step from :func:`unigram_lm_scores` toward CCNet's
    KenLM filter (Wenzek et al. 2019 train a 5-gram LM): a corpus-
    derived BIGRAM model with Dirichlet smoothing against the unigram
    prior — p(t_i | t_{i-1}) = (c(t_{i-1}, t_i) + alpha * p_uni(t_i)) /
    (c_left(t_{i-1}) + alpha), where c_left(w) counts w's occurrences
    as a bigram left-hand side (Chen & Goodman 1999's additive/prior
    smoothing family). The first token of a document scores under the
    unigram model; cross_entropy = -mean ln p over all n_tokens terms,
    perplexity = exp(ce), min_logp = the most surprising term. A
    word-salad document (plausible words, implausible transitions)
    scores high here while passing the unigram filter.

    100-TB shape: the same two-pass train/apply split as the unigram
    scorer, one order up. Pass 1 builds the bigram count table from an
    IN-ROW zip of each doc's adjacent tokens (slice + arrays_zip — no
    self-join to form pairs) collapsed map-side to ~bigram-type rows;
    the left-marginal and unigram tables are further collapses of it.
    Pass 2 joins the three stat tables back onto the occurrence stream —
    broadcast by default (Zipf-truncated bigram types; set
    broadcast_stats=False past broadcastable size to let AQE pick
    shuffle-hash) — and the per-doc collapse combines map-side. Trained
    on the scored corpus itself, every observed transition has count
    >= 1, so there is no OOV path (exactly like the unigram leg).
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    from pyspark import StorageLevel

    # One tokenize, persisted: four consumers branch from the token-array
    # relation (bigram counts, the transition scoring pass, the unigram
    # occurrence counts, the first-token leg) — without the persist each
    # re-runs the regex tokenize over the whole corpus.
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_col(F.col(text_col)).alias("t"),
    ).where(F.size("t") >= 1).persist(StorageLevel.MEMORY_AND_DISK)
    m = F.size("t")
    pairs = toks.select(
        "doc_id",
        F.explode_outer(
            F.arrays_zip(
                F.slice("t", 1, m - 1).alias("prev"),
                F.slice("t", 2, m - 1).alias("cur"),
            )
        ).alias("pc"),
    ).where(F.col("pc").isNotNull()).select(
        "doc_id", F.col("pc.prev").alias("prev"), F.col("pc.cur").alias("cur")
    )
    occ = toks.select("doc_id", F.explode_outer("t").alias("tok")).where(
        F.col("tok") != ""
    )
    uni = occ.groupBy("tok").agg(F.count("*").cast("double").alias("c"))
    total = uni.agg(F.sum("c").alias("tot"))
    puni = uni.crossJoin(F.broadcast(total)).select(
        "tok", (F.col("c") / F.col("tot")).alias("pu")
    )
    bgc = pairs.groupBy("prev", "cur").agg(
        F.count("*").cast("double").alias("cbg")
    )
    prevc = bgc.groupBy("prev").agg(F.sum("cbg").alias("cprev"))
    if broadcast_stats:
        puni, bgc, prevc = F.broadcast(puni), F.broadcast(bgc), F.broadcast(prevc)
    trans = (
        pairs.join(bgc, ["prev", "cur"])
        .join(prevc, "prev")
        .join(puni.withColumnRenamed("tok", "cur"), "cur")
        .select(
            "doc_id",
            F.log(
                (F.col("cbg") + F.lit(float(alpha)) * F.col("pu"))
                / (F.col("cprev") + F.lit(float(alpha)))
            ).alias("logp"),
        )
    )
    first = (
        toks.select("doc_id", F.element_at("t", 1).alias("tok"))
        .join(puni, "tok")
        .select("doc_id", F.log("pu").alias("logp"))
    )
    return (
        trans.unionByName(first)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (-F.avg("logp")).alias("_ce"),
            F.min("logp").alias("_min_logp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round("_ce", 4).alias("cross_entropy"),
            F.round(F.exp("_ce"), 4).alias("perplexity"),
            F.round("_min_logp", 4).alias("min_logp"),
        )
    )


def boilerplate_scores(
    docs: DataFrame, n: int = 3, min_df: int = 2,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, frequent_frac, max_df_frac, avg_df_frac).

    CROSS-document repetition — the boilerplate signal behind dedup-style
    filtering (Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better": substrings shared by many documents are
    headers/footers/templates). Complements repetition_scores, which is
    WITHIN-document. Per document over its n-gram token occurrences:
    frequent_frac = fraction of occurrences whose gram appears in
    >= min_df distinct documents; max_df_frac / avg_df_frac = the
    max/mean document-frequency of the doc's grams as a fraction of the
    gram-bearing corpus. A doc that is mostly template scores near 1.

    100-TB shape: same two-pass train/apply split as unigram_lm_scores —
    pass 1 builds the gram→df table (per-doc DISTINCT grams explode from
    an in-row array_distinct, so df is a plain count, not a
    count_distinct whose per-gram distinct buffers the doc ids), pass 2
    broadcast-joins df back onto the occurrences and the per-doc
    collapse combines map-side. The gram-array relation is computed once
    and persisted (MEMORY_AND_DISK): the df pass, the doc count and the
    apply pass all branch from it instead of re-running
    tokenize+transform per pass. ndocs collapses in-row (any doc with
    >= n tokens has grams — no corpus-wide distinct). Gram space is
    vocab^n-ish but Zipf-truncated in practice; for corpora where it
    outgrows broadcast, the join degrades to shuffle-hash, never
    all-pairs. Documents with fewer than n tokens have no grams and are
    dropped.
    """
    from pyspark import StorageLevel

    garr = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_col(F.col(text_col)).alias("t"),
    ).select(
        # two-step projection: _grams_col's lambda slices its argument
        # per element — inlining the tokenize here would re-run the
        # regex split per gram (see _shingle_array_col)
        "doc_id", _grams_col(F.col("t"), n).alias("g"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    g = garr.select("doc_id", F.explode_outer("g").alias("gram")).where(
        F.col("gram") != ""
    )
    df_tab = (
        garr.select(F.explode_outer(F.array_distinct("g")).alias("gram"))
        .where(F.col("gram") != "")
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    ndocs = garr.agg(
        F.sum((F.size("g") > 0).cast("double")).alias("nd")
    )
    return (
        g.join(F.broadcast(df_tab), "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.avg((F.col("df") >= min_df).cast("double")).alias("_ff"),
            F.max("df").alias("_maxdf"),
            F.avg("df").alias("_avgdf"),
        )
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "n_grams",
            F.round("_ff", 4).alias("frequent_frac"),
            F.round(F.col("_maxdf") / F.col("nd"), 4).alias("max_df_frac"),
            F.round(F.col("_avgdf") / F.col("nd"), 4).alias("avg_df_frac"),
        )
    )


def dsir_weights(
    docs: DataFrame, target: DataFrame, hex_chars: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
    target_text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_feats, log_weight, avg_log_ratio, unseen_frac):
    DSIR-style importance weights — Data Selection via Importance
    Resampling (Xie et al. 2023): score each corpus document by how much
    a hashed-n-gram bag model of the TARGET distribution prefers it over
    the raw-corpus model. Features are unigram + bigram token
    occurrences hashed into 16^hex_chars buckets (bucket = the first
    hex_chars of md5(gram) — exact in any engine, like simhash16's
    nibbles); bucket probabilities are Laplace-smoothed
    (count+1)/(total+B). Per doc over its feature occurrences:
    log_weight = Σ (ln p_target(b) − ln p_corpus(b)) — the DSIR log
    importance weight (resample ∝ exp of it, e.g. via stratum_quota on a
    log_weight band or top-k with seeded Gumbel noise); avg_log_ratio
    normalizes by doc length; unseen_frac = fraction of occurrences in
    buckets the target never produced (a high value marks out-of-domain
    text directly). Documents with zero tokens have no features and are
    dropped (matching unigram_lm_scores).

    100-TB shape: the same two-pass train/apply split as
    unigram_lm_scores, with a FIXED-size stats table — both bucket-count
    aggregations collapse map-side into <= B rows (B = 4096 at the
    default), the totals ride broadcast 1-row aggregates, and the
    bucket→log-ratio table broadcasts unconditionally (it cannot outgrow
    B rows, unlike a vocabulary), so the corpus side never shuffles: one
    row per document enters the final exchange. The corpus feature
    relation (tokenize + gram explode + md5 bucket — the dominant scan)
    is computed ONCE and persisted: the count pass and the apply join
    both branch from it instead of re-hashing the corpus.
    """
    from pyspark import StorageLevel

    if not 1 <= hex_chars <= 8:
        raise ValueError("hex_chars must be in [1, 8]")
    B = 16 ** hex_chars

    def _feats(df: DataFrame, idc: str | None, txc: str) -> DataFrame:
        # two-step projection: _grams_col's lambda slices its argument
        # per element — an inlined tokenize would re-run the regex split
        # per gram (see _shingle_array_col)
        base = df.select(
            *([F.col(idc).alias("doc_id")] if idc else []),
            tokenize_col(F.col(txc)).alias("t"),
        )
        t = F.col("t")
        cols = ([F.col("doc_id")] if idc else []) + [
            F.concat(t, _grams_col(t, 2)).alias("g")
        ]
        # explode_outer + isNotNull: see shingles()
        return (
            base.select(*cols)
            .select(
                *(["doc_id"] if idc else []),
                F.explode_outer("g").alias("gram"),
            )
            .where(F.col("gram").isNotNull())
            .withColumn("bucket", F.substring(F.md5("gram"), 1, hex_chars))
            .drop("gram")
        )

    cor = _feats(docs, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    tgtb = (
        _feats(target, None, target_text_col)
        .groupBy("bucket")
        .agg(F.count("*").cast("double").alias("ct"))
    )
    corb = cor.groupBy("bucket").agg(F.count("*").cast("double").alias("cq"))
    tt = tgtb.agg(F.coalesce(F.sum("ct"), F.lit(0.0)).alias("tt"))
    tq = corb.agg(F.sum("cq").alias("tq"))
    ratio = (
        corb.join(tgtb, "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tq))
        .select(
            "bucket",
            (
                F.log((F.coalesce("ct", F.lit(0.0)) + 1.0) / (F.col("tt") + B))
                - F.log((F.col("cq") + 1.0) / (F.col("tq") + B))
            ).alias("lr"),
            F.col("ct").isNull().cast("double").alias("unseen"),
        )
    )
    return (
        cor.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("lr"), 4).alias("log_weight"),
            F.round(F.avg("lr"), 4).alias("avg_log_ratio"),
            F.round(F.avg("unseen"), 4).alias("unseen_frac"),
        )
    )


def curate(
    docs: DataFrame, bench: DataFrame | None = None,
    min_tokens: int = 16, max_top2_frac: float = 0.09,
    dedup_threshold: float = 0.8, num_hashes: int = 8, bands: int = 4,
    n: int = 3, id_col: str = "doc_id", text_col: str = "text",
    bench_text_col: str = "text",
    quality: DataFrame | None = None, quality_alpha: float = 9.0,
    quality_seed: int = 7,
) -> DataFrame:
    """(doc_id, keep, reason): the end-to-end curation verdict — the
    composed pipeline every training corpus runs before a model sees it,
    as ONE declarative job. Fixed rule order, first match wins (the order
    real pipelines apply them):

      1 = too short        (n_tokens < min_tokens — Gopher word-count cut)
      2 = repetitive       (top_2gram_frac > max_top2_frac — Gopher A1.1)
      3 = near-duplicate   (non-canonical in the transitive closure of
                            verified LSH∩Jaccard pairs; min doc_id kept)
      4 = contaminated     (>=1 distinct n-gram shingle in the benchmark
                            set; skipped when bench is None)
      5 = low quality      (the GPT-3 Pareto keep rule rejects the doc's
                            classifier score — ``quality`` is a
                            (doc_id, quality_prob) frame from
                            :func:`quality_model.score_quality`; skipped
                            when None. Docs absent from ``quality`` pass —
                            unscored is not low-quality.)
      0 = keep

    Every doc gets a verdict row — curation REPORTS, the caller filters
    (`.where("keep")`), so audit trails and reason histograms are free.

    100-TB shape: a composition of the already-scaling parts —
    repetition_scores is in-row codegen (zero exchanges), dedup_near is
    band-bucketed LSH + candidate-only Jaccard + diameter-bounded label
    propagation, decontaminate broadcasts the eval set — stitched by
    doc_id equi-joins of per-doc (not corpus-sized) aggregates. Each
    stage re-scans the corpus once; a production run over cold storage
    would persist the token arrays up front and hand them to each stage.
    """
    # n_tokens and the repetition signal are both in-row expressions over
    # the same token array: ONE corpus scan computes both (the separate
    # base ⋈ rep join of earlier rounds re-tokenized the corpus and paid
    # an extra doc_id exchange for rows that were 1:1 by construction).
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_col(F.col(text_col)).alias("t"),
    ).select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        # project the gram array before the top-frac expression, which
        # references it three times (see _shingle_array_col on why
        # multiply-referenced array expressions must be projected)
        _grams_col(F.col("t"), 2).alias("g2"),
    ).select(
        "doc_id",
        "n_tokens",
        _top_gram_frac_col(F.col("g2")).alias("top_2gram_frac"),
    )
    dd = dedup_near(
        docs, dedup_threshold, num_hashes, bands, n, id_col, text_col
    ).select("doc_id", "is_dup")
    j = base.join(dd, "doc_id", "left")
    if bench is not None:
        dec = decontaminate(
            docs, bench, n, 1, id_col, text_col, bench_text_col
        ).select("doc_id", "contaminated")
        j = j.join(dec, "doc_id", "left")
    else:
        j = j.withColumn("contaminated", F.lit(False))
    if quality is not None:
        from katta_spark.quality_model import pareto_keep_expr

        q = quality.select(
            F.col(id_col).alias("doc_id"),
            (~pareto_keep_expr(
                quality_alpha, quality_seed, id_col=id_col
            )).alias("low_quality"),
        )
        j = j.join(q, "doc_id", "left")
    else:
        j = j.withColumn("low_quality", F.lit(False))
    reason = (
        F.when(F.col("n_tokens") < min_tokens, 1)
        .when(F.col("top_2gram_frac") > max_top2_frac, 2)
        .when(F.coalesce(F.col("is_dup"), F.lit(False)), 3)
        .when(F.coalesce(F.col("contaminated"), F.lit(False)), 4)
        .when(F.coalesce(F.col("low_quality"), F.lit(False)), 5)
        .otherwise(0)
    )
    return j.select(
        "doc_id",
        (reason == 0).alias("keep"),
        reason.cast("int").alias("reason"),
    )


def doc_fingerprint(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): min-shingle-hash document fingerprint —
    a 1-hash MinHash, stable under small edits away from the minimum."""
    return shingles(docs, n, id_col, text_col).groupBy("doc_id").agg(
        F.min(F.md5("shingle")).alias("fingerprint")
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 8, w: int = 4,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, fingerprint): winnowing fingerprints (Schleimer/Wilkerson/
    Aiken, MOSS) — hash every character k-gram, keep the minimum of each
    sliding window of w hashes, emit the distinct minima.

    Classic implementations maintain a Rabin-Karp ROLLING hash for O(1)
    per-gram updates; the dataflow-native equivalent computes each k-gram
    hash independently but VECTORIZED (one array expression per document,
    whole-stage codegen) — same fingerprints, no per-row Python, and the
    per-doc cost is len·k inside one JVM expression. Guarantee preserved:
    any shared substring of length ≥ w + k - 1 yields a shared fingerprint.
    """
    # SQL exprs because substring() needs a runtime start index per element
    hashes = F.expr(
        f"CASE WHEN length({text_col}) >= {k} THEN "
        f"transform(sequence(1, length({text_col}) - {k - 1}), "
        f"i -> md5(substring({text_col}, i, {k}))) "
        f"ELSE array() END"
    )
    minima = F.expr(
        f"CASE WHEN size(h) >= {w} THEN "
        f"transform(sequence(1, size(h) - {w - 1}), "
        f"i -> array_min(slice(h, i, {w}))) "
        f"WHEN size(h) > 0 THEN array(array_min(h)) "
        f"ELSE array() END"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), hashes.alias("h"))
        # explode_outer + isNotNull: see shingles() — the inferred
        # pre-Generate filter would re-run the per-window md5 transform
        .select("doc_id", F.explode_outer(minima).alias("fingerprint"))
        .where(F.col("fingerprint").isNotNull())
        .distinct()
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    default_rate: float = 0.0,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the domain-quota /
    source-mixing step of a training-data pipeline.

    A row survives iff the first 8 hex digits of md5(id|seed), read as an
    integer, fall below rate(stratum) · 16⁸ — a pure function of the row,
    so the sample is reproducible across runs, engines (md5 is
    cross-engine, unlike xxhash64) and cluster sizes, and any two rates
    r₁ < r₂ give NESTED samples (the r₁ sample is a subset of the r₂
    one — growing a quota only adds rows). No shuffle at all: the filter
    is a codegen expression on the scan.
    """
    u = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col(id_col).cast("string"),
                                      F.lit(str(seed)))), 1, 8),
        16, 10,
    ).cast("long")
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(rate)
    return docs.where(u < (rate * F.lit(float(16 ** 8))).cast("long"))


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 512,
    buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket, pack_id, n_tokens): deterministic sequence packing
    — group documents into ~``max_tokens``-token training bins.

    Docs are hash-assigned to ``buckets`` independent packing streams
    (pmod(id, buckets)); within a stream they pack greedily in id order:
    pack_id = floor((running token total exclusive of the doc) /
    max_tokens). Each stream's cumsum is one window over its OWN
    partition — the buckets bound the window's partition size, so packing
    parallelizes bucket-wise instead of forcing a global sort (at 100 TB,
    set buckets ≈ cores · a few; determinism is unaffected because the
    stream assignment and in-stream order are pure functions of the id).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(buckets)).cast("int").alias("bucket"),
        F.size(tokenize_col(F.col(text_col))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.select(
        "doc_id",
        "bucket",
        F.floor(cum_before / F.lit(max_tokens)).cast("long").alias("pack_id"),
        "n_tokens",
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 2048,
    stride: int | None = None,
    drop_partial: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, start_tok, n_tokens, chunk_text): token-window
    document chunking — the long-document counterpart of pack_sequences
    (that op packs SHORT docs into bins; this one cuts LONG docs into
    training/RAG samples of <= max_tokens tokens, advancing by ``stride``
    tokens per chunk; stride < max_tokens overlaps consecutive chunks —
    the standard pretraining context-window cutter).

    Chunk starts are 0, stride, 2·stride, … < n_tokens, so chunks never
    start past the text and every document keeps >= 1 chunk (an empty doc
    keeps one empty chunk — the per-doc verdict shape every op here
    follows). drop_partial=True keeps only full max_tokens-token chunks,
    except chunk 0 (a doc shorter than max_tokens survives whole — the
    conversation_windows rule in token space). chunk_text re-joins the
    analyzed tokens with single spaces: token-level, like every analysis
    op in this engine (the raw-byte offsets a lossless cutter would need
    are not preserved by tokenize_col; document-level slicing on raw text
    belongs upstream of tokenization).

    100-TB shape: entirely in-row whole-stage codegen — sequence()
    enumerates starts, slice() cuts each window, ONE explode_outer emits
    chunks; zero exchanges at any corpus size, output rows ~= input rows
    x ceil(doclen/stride).
    """
    if stride is None:
        stride = max_tokens
    if stride <= 0 or max_tokens <= 0:
        raise ValueError("max_tokens and stride must be positive")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_col(F.col(text_col)).alias("t")
    )
    chunks = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(F.size("t") - 1, F.lit(0)),
            F.lit(stride),
        ),
        lambda s, i: F.struct(
            i.cast("long").alias("chunk_idx"),
            s.cast("long").alias("start_tok"),
            F.slice(F.col("t"), s + 1, max_tokens).alias("ctoks"),
        ),
    )
    out = (
        toks.select("doc_id", F.explode_outer(chunks).alias("c"))
        .where(F.col("c").isNotNull())
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.start_tok").alias("start_tok"),
            F.size("c.ctoks").cast("long").alias("n_tokens"),
            F.array_join("c.ctoks", " ").alias("chunk_text"),
        )
    )
    if drop_partial:
        out = out.where(
            (F.col("n_tokens") == max_tokens) | (F.col("chunk_idx") == 0)
        )
    return out


def windowed_event_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(window_start, event_type, n_events, sum_value): tumbling-window
    aggregation over the events stream/table.

    Built on F.window so THE SAME expression runs in batch (this gate)
    and under Structured Streaming with a watermark
    (streaming.stream_windowed_counts) — late events beyond the watermark
    are dropped by Spark's state eviction, everything else lands in its
    event-time bucket regardless of arrival order.
    """
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_len).alias("w"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(event_id, user_id, ts, session_id, session_start, *keep_cols):
    gap-based sessionization — a new session starts when a user's
    inter-event gap exceeds ``gap`` (the classic web-analytics/
    training-log primitive). ``keep_cols`` ride through unchanged so a
    session-level aggregation needs no join back to the source.

    session_id is the per-user ordinal (1-based) of the session;
    session_start its first event's timestamp, so downstream session-level
    aggregation is a plain groupBy(user_id, session_id).

    Scale shape: ONE shuffle by user_id; both windows (the lag and the
    running sum) share the exact same partitioning + ordering, so Catalyst
    plans them in a single Window exchange+sort. Per-user data is bounded
    by that user's event count — a hot user bounds the task, the corpus
    size does not. Ordering ties on ts are broken by event_id so the
    assignment is deterministic under any input order.
    """
    from pyspark.sql import Window

    base = events.select(
        F.col(id_col).alias("event_id"),
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        *[F.col(c) for c in keep_cols],
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr(f"INTERVAL {gap}")),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_sid = base.withColumn("_new", new_s).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_sid.withColumn(
        "session_start",
        F.min("ts").over(Window.partitionBy("user_id", "session_id")),
    ).select(
        "event_id", "user_id", "ts", "session_id", "session_start", *keep_cols
    )


def stratum_quota(
    docs: DataFrame,
    quotas: dict[str, int],
    strata_col: str = "source",
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-stratum quotas (keep at most N rows per domain) —
    the hard-cap companion of :func:`stratified_sample`'s rates.

    Rows within a stratum are ranked by md5(id|seed) (a deterministic
    uniform order, so the kept set is an unbiased, reproducible sample)
    and the first ``quota`` survive. One shuffle by stratum; the rank
    window is per-stratum so no global sort exists. Strata without a
    quota are dropped. Quota monotonicity: raising a stratum's quota
    only ADDS rows (the ranking is fixed).
    """
    from pyspark.sql import Window

    h = F.md5(
        F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    quota = F.lit(None).cast("int")
    for s, n in sorted(quotas.items()):
        quota = F.when(F.col(strata_col) == s, F.lit(int(n))).otherwise(quota)
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        docs.withColumn("_q", quota)
        .where(F.col("_q").isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.col("_q"))
        .drop("_q", "_rk")
    )


def temperature_quotas(
    docs: DataFrame, strata_col: str = "source", alpha: float = 0.5,
    total: int | None = None,
) -> DataFrame:
    """(stratum, n_docs, quota): temperature-flattened mixture quotas —
    quota_c ∝ n_c^alpha, normalized to ``total`` (default: the corpus
    size). The Gopher/PaLM domain-mixing rule: alpha < 1 upweights small
    domains relative to raw proportion (alpha=1 = proportional, alpha=0 =
    uniform). Feed the result into :func:`stratum_quota` to materialize
    the sample deterministically.

    Largest-remainder rounding makes the integer quotas sum EXACTLY to
    ``total`` (floor each share, then hand the leftover units to the
    largest fractional remainders, ties by stratum name) — so a
    downstream token-budget plan lands on its budget instead of drifting
    by one per domain. A small stratum's quota may exceed its n_docs at
    low alpha; stratum_quota then keeps all available rows (sampling
    without replacement — the Gopher tables cap there too).

    100-TB shape: one stratum-sized aggregate (map-side combined); the
    weighting, normalization, and remainder ranking run over the
    stratum-count-sized result (a window over domains, not rows).
    """
    from pyspark.sql import Window

    counts = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    weighted = counts.withColumn("_w", w)
    tot = weighted.agg(
        F.sum("_w").alias("_tw"),
        F.sum("n_docs").alias("_tn"),
    )
    t_expr = (
        F.lit(int(total)).cast("double") if total is not None
        else F.col("_tn").cast("double")
    )
    raw = weighted.crossJoin(F.broadcast(tot)).select(
        "stratum", "n_docs",
        (F.col("_w") / F.col("_tw") * t_expr).alias("_raw"),
        t_expr.alias("_t"),
    )
    base = raw.select(
        "stratum", "n_docs", "_t",
        F.floor("_raw").cast("long").alias("_base"),
        (F.col("_raw") - F.floor("_raw")).alias("_frac"),
    )
    leftover = base.agg(
        (F.first("_t") - F.sum("_base")).cast("long").alias("_left")
    )
    rk = Window.orderBy(F.col("_frac").desc(), F.col("stratum").asc())
    return (
        base.crossJoin(F.broadcast(leftover))
        .withColumn("_rk", F.row_number().over(rk))
        .select(
            "stratum", "n_docs",
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0)
            ).cast("long").alias("quota"),
        )
    )


# Kept RE2-and-Java-compatible (no backreferences, no lookaround) so the
# exact patterns run identically in Spark and the DuckDB oracle.
REDACT_PATTERNS = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_text(
    docs: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Scrub emails / URLs / IPv4 literals from text (the PII-hygiene pass
    of a training pipeline) — chained JVM regexp_replace, no Python."""
    col = F.col(text_col)
    for pat, token in REDACT_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    return docs.withColumn(out_col, col)
