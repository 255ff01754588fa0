"""Deduplication operators for large-scale document corpora.

Three tiers, increasing recall / cost:

* ``exact_dedup`` — content-hash groupBy. One shuffle on a 128-bit hash;
  at 100 TB this is the cheapest possible dedup (hash is computed map-side,
  shuffle carries only (hash, id)).
* ``jaccard_similar_pairs`` — exact token-set Jaccard with *prefix
  filtering* (PPJoin-style): the inverted-index self-join runs only over each
  document's rarest-token prefix, so a stopword shared by 10⁶ documents never
  enters the join. Exact by the prefix-filter lemma; candidates are verified
  against the full token sets.
* ``minhash_near_dup`` — MinHash + banded LSH. Deterministic seeded hash
  family (xxhash64 of seed-prefixed tokens), so signatures are reproducible
  across runs/executors. Candidates from band-bucket joins, then exact Jaccard
  verification of the (few) candidates. This is the 100 TB scale path: cost is
  O(n · perms) map-side plus a shuffle keyed on (band, bucket).

The reference implements only whole-row drop_duplicates
(``/root/reference/pipeline/bronze_to_silver.py:54-56``, D1-D3 in SURVEY.md);
everything here is north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Group rows by content hash; emit one canonical id + duplicate count per
    distinct content. Deterministic canonical choice: min id."""
    return (
        df.select(F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _token_sets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokenize(text_col)).alias("tokens"),
    )


def jaccard_similar_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    prefix_filter: bool = True,
) -> DataFrame:
    """Exact word-set Jaccard pairs ≥ threshold. Returns (id_a, id_b, jaccard)
    with id_a < id_b.

    ``prefix_filter=True`` (the scale path) generates candidates from each
    document's *prefix* under the global rarest-first token order instead of
    every token: sort each document's tokens by (document frequency, token)
    and keep the first ``|A| − ⌈t·|A|⌉ + 1``. The prefix-filter lemma makes
    this exact, not approximate: J(A,B) ≥ t implies |A∩B| ≥ ⌈t·|A|⌉ (since
    |A∩B| ≥ t·|A| from J = O/(|A|+|B|−O) ≥ t and |B| ≥ O), and a set sharing
    ≥ α elements with A must hit A's first |A|−α+1 elements in any order both
    sides sort by. Surviving candidate pairs are verified on the FULL token
    sets, so the output is identical to the naive plan (unit-tested).

    This is the defense against posting-list explosion: a stopword with
    document frequency 10⁶ lands in a document's prefix only when the
    document has essentially no rarer tokens, so the self-join's per-token
    groups stay near the rare tail instead of quadratic in the corpus.
    The df ranking costs one extra token-grain aggregation; the per-document
    prefix cut is a window partitioned by document id (no global sort).
    Measured on a corpus where 10 stopwords appear in EVERY document
    (local[32]): prefix-filter processes 20,000 docs in 7.4 s; the naive
    join needs 68 s for 4,000 docs and scales quadratically from there
    (~10⁸ candidate pairs per stopword at 20k docs).

    ``prefix_filter=False`` keeps the naive full inverted-index join — the
    verification baseline.
    """
    sets = _token_sets(df, id_col, text_col)
    return jaccard_pairs_from_sets(sets, threshold, prefix_filter=prefix_filter)


def jaccard_pairs_from_sets(
    sets: DataFrame, threshold: float, prefix_filter: bool = True
) -> DataFrame:
    """Core of :func:`jaccard_similar_pairs` over an arbitrary ``(id,
    tokens)`` set table — reused by the word-set and shingle-set variants
    (any element vocabulary works; 'token' below means set element).

    Candidate generation groups the (prefix) postings by token and expands
    ordered pairs from each token's id list — ONE evaluation of the posting
    DAG and one shuffle, where the textbook inverted-index self-join would
    re-evaluate the whole upstream plan (df ranking + prefix window) for
    each join side and add a join exchange on top (measured 2× end-to-end
    on the shingle variant). Per-token output volume is df² either way —
    a self-join also colocates one token's rows in one task — and the
    prefix filter is what keeps df small, so skew behavior is unchanged."""
    postings = sets.select(
        # set_size rides along from before the explode — joining it back on
        # id afterwards (the naive shape) would add an id-keyed exchange of
        # the full posting table.
        "id", F.size("tokens").alias("set_size"), F.explode("tokens").alias("token")
    )
    if prefix_filter:
        from pyspark.sql import Window

        # Document frequency as a count-over-token WINDOW rather than a
        # groupBy + join back: same values, but the posting table (and the
        # whole upstream tokenize/shingle pipeline) is evaluated ONCE — the
        # join form re-derived it for each side of the dfreq join. Shuffle
        # count is unchanged (token here, id below).
        wt = Window.partitionBy("token")
        # Prefix length |A| − ⌈t·|A|⌉ + 1 under rarest-first canonical order.
        w = Window.partitionBy("id").orderBy("df", "token")
        # ``pos`` (the token's 1-based rank in the document under the global
        # (df, token) order) rides into the candidate pairs for the PPJoin
        # positional filter below — 4 extra bytes per posting through the
        # token-keyed exchange buys a candidate cut ahead of the pair-keyed
        # exchanges and the corpus-sized verify join.
        cand_src = (
            postings.withColumn("df", F.count(F.lit(1)).over(wt))
            .withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= F.col("set_size") - F.ceil(threshold * F.col("set_size")) + 1)
            .select("id", "set_size", "pos", "token")
        )
    else:
        cand_src = postings.withColumn("pos", F.lit(None).cast("int"))
    ids = F.sort_array(F.collect_list(F.struct("id", "set_size", "pos")))
    # Two-stage expansion keeps every materialized array O(df): the grouped
    # ids list is posexploded to (left element, ids) rows FIRST, and each row
    # then expands only its tail slice. A single flatten(transform(transform))
    # would build all O(df²) ordered pairs of a token as one in-memory array —
    # with a high-df token (any stopword on the prefix_filter=False baseline
    # path) that hits executor OOM / Spark's 2 GB array limit before the
    # explode ever streams it. Both explodes are narrow (no extra shuffle).
    pair = (
        cand_src.groupBy("token")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.col("ids"), F.posexplode("ids").alias("i", "a"))
        .select(
            F.explode(
                # Ordered pairs (a, ids[j>i]); slice start is 1-based.
                F.transform(
                    F.slice(F.col("ids"), F.col("i") + F.lit(2), F.size("ids")),
                    lambda y: F.struct(
                        F.col("a.id").alias("id_a"),
                        y["id"].alias("id_b"),
                        F.col("a.set_size").alias("size_a"),
                        y["set_size"].alias("size_b"),
                        F.col("a.pos").alias("pos_a"),
                        y["pos"].alias("pos_b"),
                    ),
                )
            ).alias("p")
        )
    )
    # PPJoin length filter: J ≥ t ⟹ |A∩B| ≥ t·max(|A|,|B|) and
    # |A∩B| ≤ min(|A|,|B|), so pairs with min < t·max can't qualify —
    # pruned here, before the (distinct + verify-join) stages pay for
    # them (cuts the candidate volume before the only pair-keyed
    # exchanges in the plan).
    sized = pair.filter(
        F.least("p.size_a", "p.size_b")
        >= threshold * F.greatest("p.size_a", "p.size_b")
    )
    if prefix_filter:
        # PPJoin positional filter (Xiao et al., WWW'08 §3.2), aggregated
        # over the pair's candidate rows in the SAME exchange the plain
        # distinct() would pay. Soundness: let w be the pair's largest
        # common prefix token, at ranks (i*, j*) = (max pos_a, max pos_b)
        # — ranks are monotone in the global (df, token) order, so both
        # maxima land on w. Every common token < w sorts before w inside
        # each document and is therefore also inside both prefixes, so
        # c = count(candidate rows) counts ALL common tokens ≤ w; common
        # tokens > w sit after rank i* in A and j* in B, at most
        # min(|A|−i*, |B|−j*) of them. Hence
        #   |A∩B| ≤ c + min(|A|−i*, |B|−j*),
        # and J ≥ t needs |A∩B| ≥ t·(|A|+|B|)/(1+t); pairs whose bound
        # can't reach that are dropped before the verify join ever sees
        # them (1e-9 slack covers double rounding of the threshold — the
        # filter must only ever be conservative). Exactness is unchanged:
        # survivors still go through the full-set verification below.
        cand = (
            sized.groupBy("p.id_a", "p.id_b")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.max("p.pos_a").alias("ia"),
                F.max("p.pos_b").alias("ib"),
                F.first("p.size_a").alias("sa"),
                F.first("p.size_b").alias("sb"),
            )
            .filter(
                F.col("c")
                + F.least(F.col("sa") - F.col("ia"), F.col("sb") - F.col("ib"))
                >= threshold / (1.0 + threshold) * (F.col("sa") + F.col("sb"))
                - 1e-9
            )
            .select("id_a", "id_b")
        )
    else:
        cand = sized.select("p.id_a", "p.id_b").distinct()
    # Exact verification on the full token sets (same arithmetic as the naive
    # count-based formula: integer sizes divided in double). Candidates are
    # MELTED to (pair, side, id) so ``sets`` — a corpus-sized relation whose
    # lineage re-runs the tokenize/shingle pipeline — is joined ONCE; the
    # regroup that reassembles each pair's two arrays shuffles only
    # candidate-sized data. The two-join form shuffled (and re-derived) the
    # corpus twice.
    sides = cand.select(
        "id_a",
        "id_b",
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("side"), F.col("id_a").alias("id")),
                F.struct(F.lit("b").alias("side"), F.col("id_b").alias("id")),
            )
        ).alias("s"),
    ).select("id_a", "id_b", "s.side", "s.id")
    both = (
        sides.join(sets, "id")
        .groupBy("id_a", "id_b")
        .agg(
            # Exactly one non-null per (pair, side): first() is deterministic.
            F.first(
                F.when(F.col("side") == "a", F.col("tokens")), ignorenulls=True
            ).alias("tokens_a"),
            F.first(
                F.when(F.col("side") == "b", F.col("tokens")), ignorenulls=True
            ).alias("tokens_b"),
        )
    )
    inter = F.size(F.array_intersect("tokens_a", "tokens_b"))
    union = F.size(F.array_union("tokens_a", "tokens_b"))
    return (
        both.select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# 64-bit signatures: 32 bits saturate on web-scale corpora (collision-heavy
# beyond ~10⁸ documents); 64 is the standard SimHash width (Manku et al.,
# WWW'07) and fits exactly in one Spark long.
SIMHASH_BITS = 64


def _simhash_counters(tokens: Column) -> Column:
    """Per-bit ±1 accumulators of the SIMHASH_BITS-bit SimHash: one array fold
    over the tokens; bit positions are Python-level constants (shift amounts
    must be ints, not Columns)."""

    def _bit_signs(t: Column) -> Column:
        return F.array(
            *[
                F.when(
                    F.shiftright(F.xxhash64(t), j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for j in range(SIMHASH_BITS)
            ]
        )

    return F.aggregate(
        tokens,
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, t: F.zip_with(acc, _bit_signs(t), lambda a, b: a + b),
    )


def _simhash_signatures_md5(sets: DataFrame) -> DataFrame:
    """(id, sig) via the md5 bit family: bit j of a token is the high bit of
    hex digit j+1 of md5("0|"+t) ∥ md5("1|"+t) (two seeded md5s → 64 bits).

    Every engine with md5() computes the identical bits, so this family makes
    the whole SimHash pipeline oracle-replayable (the xxhash64 default
    doesn't exist outside the JVM). Shape differs from the fold-based
    default on purpose: posexplode + one md5 pair per token + a 64-column
    codegen'd SUM agg — HOF lambdas are interpreted, and referencing the
    md5 from inside one would re-hash per bit."""
    tok = sets.select("id", F.explode("tokens").alias("t"))
    h = F.concat(
        F.md5(F.concat(F.lit("0|"), F.col("t"))),
        F.md5(F.concat(F.lit("1|"), F.col("t"))),
    )
    hx = tok.select("id", h.alias("hx"))
    high = tuple("89abcdef")
    sums = [
        F.sum(
            F.when(F.substring("hx", j + 1, 1).isin(*high), F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    counters = hx.groupBy("id").agg(*sums)
    return counters.select(
        "id",
        _pack_simhash(
            F.array(*[F.col(f"s{j}") for j in range(SIMHASH_BITS)])
        ).alias("sig"),
    )


def _pack_simhash(counters: Column) -> Column:
    """Sign vector → packed long (bit j set iff counter j > 0).

    Bit 63 is the long's sign bit: its addend is −2⁶³ (two's complement) —
    ``1 << 63`` itself does not fit a signed long literal. Partial sums stay
    in range: positives total ≤ 2⁶³−1 and the single negative addend brings
    the result to exactly the intended bit pattern, no wraparound."""

    def _addend(j: int) -> int:
        return -(1 << 63) if j == 63 else (1 << j)

    bits = [
        F.when(F.element_at(counters, j + 1) > 0, F.lit(_addend(j)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for j in range(SIMHASH_BITS)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("long")


def simhash_near_dup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """SimHash near-duplicate pairs: Hamming distance ≤ max_hamming.

    Candidate generation by band-equality (pigeonhole: distance ≤ bands−1
    guarantees at least one equal band), then exact Hamming verification via
    bit_count of the XOR. Shuffle carries (band, band-bits, id, sig) only.
    ``bands`` must divide SIMHASH_BITS and exceed ``max_hamming`` for the
    pigeonhole guarantee (default 4 bands × 16 bits covers max_hamming ≤ 3).

    ``hash_family``: "xxhash64" (default, JVM-only) or "md5"
    (cross-engine-reproducible bits — see :func:`_simhash_signatures_md5`);
    banding and verification are family-independent.
    """
    if SIMHASH_BITS % bands != 0:
        raise ValueError("bands must divide SIMHASH_BITS")
    if bands <= max_hamming:
        raise ValueError("need bands > max_hamming for exact candidate recall")
    rows = SIMHASH_BITS // bands
    sets = _token_sets(df, id_col, text_col).filter(F.size("tokens") > 0)
    if hash_family == "md5":
        sig = _simhash_signatures_md5(sets)
    else:
        # Materialize the counter array before packing — packing references
        # it 32×, and inlining would duplicate the token fold 32× in the plan.
        sig = sets.select(
            "id", _simhash_counters(F.col("tokens")).alias("counters")
        ).select("id", _pack_simhash(F.col("counters")).alias("sig"))
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * rows)
                        .bitwiseAND(F.lit((1 << rows) - 1))
                        .alias("bits"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bits")
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bits") == F.col("y.bits"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.sig").alias("sig_a"),
            F.col("y.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def _minhash_signature(
    tokens: Column, num_perms: int, hash_family: str = "xxhash64"
) -> Column:
    """num_perms MinHash values: for perm i, min over tokens of
    hash("i|" + token). Seeded by prefix → deterministic everywhere.

    ``hash_family="xxhash64"`` (default) is the production family — one JVM
    codegen hash per (perm, token), long-typed mins. ``"md5"`` is the
    cross-engine-reproducible family: the min is taken over the first 16 hex
    chars of md5, as a STRING — lexicographic min of fixed-width lowercase
    hex equals numeric min, and every engine with an md5() builtin (DuckDB
    included) computes the identical value, so the whole
    signature → band → candidate → verify pipeline becomes oracle-checkable.
    md5 costs more per hash than xxhash64; same asymptotics, same shuffle
    shape.

    NB: the transform lambda must be single-arg (a two-arg lambda would
    receive the array index as its second argument); the perm index is closed
    over via a factory function.

    Why the interpreted HOF and not the row-level codegen shape (explode +
    32-column groupBy-min), which wins 2.4× on the signature stage in
    isolation: the agg inserts a doc-grain exchange that AQE coalesces to
    ~1 partition at small corpus sizes, and everything downstream of it —
    band explode, candidate self-join, exact verify, which dominate
    end-to-end — then runs nearly single-task (measured 82 s vs 19 s for
    the full pairs pipeline at sf0.1, local[32]). The narrow HOF pipeline
    inherits the scan's full parallelism instead. At 100 TB the agg output
    is corpus-sized and AQE would keep it wide, but the signature cost is
    noise next to the verify join at any scale, so the shape that also
    behaves at bench scale wins.
    """

    def _perm_min(i: int) -> Column:
        prefix = F.lit(f"{i}|")
        if hash_family == "md5":
            return F.array_min(
                F.transform(
                    tokens,
                    lambda t: F.substring(F.md5(F.concat(prefix, t)), 1, 16),
                )
            )
        return F.array_min(F.transform(tokens, lambda t: F.xxhash64(F.concat(prefix, t))))

    return F.array(*[_perm_min(i) for i in range(num_perms)])


def minhash_near_dup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perms: int = 32,
    bands: int = 8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-verified.

    bands × rows = num_perms; with (32, 8) the S-curve crosses ~0.55 — callers
    verifying at threshold ≥ 0.6 get high recall. Candidate generation shuffles
    (band, bucket, id) only; signatures never leave the map side.

    ``hash_family`` picks the permutation family (see
    :func:`_minhash_signature`): xxhash64 for production speed, md5 for
    bit-identical cross-engine replay.
    """
    if num_perms % bands != 0:
        raise ValueError("bands must divide num_perms")
    rows = num_perms // bands
    sets = _token_sets(df, id_col, text_col).filter(F.size("tokens") > 0)
    sig = sets.select(
        "id",
        "tokens",
        _minhash_signature(F.col("tokens"), num_perms, hash_family).alias("sig"),
    )
    # One row per (band, bucket-hash, id): bucket hash = md5 of the band slice.
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(F.concat_ws(",", F.slice("sig", b * rows + 1, rows))).alias(
                            "bucket"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # Exact verification of the candidate pairs only.
    ta = sets.select(F.col("id").alias("id_a"), F.col("tokens").alias("tokens_a"))
    tb = sets.select(F.col("id").alias("id_b"), F.col("tokens").alias("tokens_b"))
    inter = F.size(F.array_intersect("tokens_a", "tokens_b"))
    union = F.size(F.array_union("tokens_a", "tokens_b"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram sets as ``(id, tokens array<string>)`` built on
    the ROW-LEVEL codegen path: posexplode the shingle start positions, build
    each n-gram with per-row ``concat_ws``/``element_at`` (whole-stage
    codegen), and regroup with ``collect_set``.

    The array-level form — ``array_distinct(transform(sequence(...),
    i -> concat_ws(' ', slice(tokens, i, n))))`` (functions/text.py:shingles)
    — is semantically identical but lambda bodies of higher-order functions
    are INTERPRETED, never codegen'd, and allocate a slice per position:
    measured 20× slower (3.4 s vs 0.16 s for 5 000 docs × ~52 shingles,
    local[32]), and the Jaccard operator evaluates its set table three times
    (postings + both verify sides). Costs one extra id-keyed exchange of the
    shingle rows; at 100 TB both that exchange and the HOF penalty scale with
    corpus tokens, and the exchange is the cheaper coefficient by an order of
    magnitude. Documents with fewer than ``n`` tokens produce no row."""
    from ..functions.text import tokenize

    base = df.select(F.col(id_col).alias("id"), tokenize(text_col).alias("t")).filter(
        F.size("t") >= n
    )
    rows = base.select(
        "id",
        "t",
        F.posexplode(F.slice("t", 1, F.size("t") - (n - 1))).alias("pos", "w0"),
    )
    gram = F.concat_ws(
        " ", "w0", *[F.element_at("t", F.col("pos") + 1 + j) for j in range(1, n)]
    )
    return rows.select("id", gram.alias("shingle")).groupBy("id").agg(
        F.collect_set("shingle").alias("tokens")
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    n: int = 3,
    prefix_filter: bool = True,
) -> DataFrame:
    """Exact word n-gram (shingle) Jaccard pairs — order-sensitive near-dup
    detection: unlike the word-set variant, a permuted document shares few
    shingles with its source, so this catches copy-with-small-edits without
    conflating bag-of-words rewrites. Same prefix-filtered exact machinery;
    set elements are the distinct n-gram strings (built by
    :func:`shingle_sets`, the codegen form). Documents with fewer than ``n``
    tokens have no shingles and produce no pairs."""
    sets = shingle_sets(df, id_col, text_col, n)
    return jaccard_pairs_from_sets(sets, threshold, prefix_filter=prefix_filter)


def excise_shared_ngrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """EXACT substring deduplication with EXCISION (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", the
    dedup-substrings tier): every repeated ``n``-token gram keeps exactly
    ONE canonical occurrence in the corpus — the minimum (doc, position)
    under a total order — and every other occurrence's token span is
    REMOVED from its document's text. This is the tier past whole-document
    dedup: boilerplate shared across otherwise-distinct pages (headers,
    licenses, navigation) gets cut out of the survivors instead of the
    survivors being dropped.

    Output: one row per input document — (id, n_tokens, n_removed,
    cleaned_text), where cleaned_text joins the surviving tokens of
    lower(text) in order. Documents shorter than ``n`` tokens pass through
    unchanged (n_removed = 0); a document that is pure boilerplate can
    clean to the empty string (caller decides whether to drop it — the
    quality gate's job, not this operator's).

    Determinism / replayability: tokenization, the md5 gram hash, the
    (doc, pos) canonical order, span cover, and reconstruction are all
    engine-replayable — the registry query's DuckDB oracle recomputes
    cleaned_text byte-for-byte.

    Scale shape: occurrences are (id, pos, 32-char hash) rows — O(corpus
    tokens), the vocabulary-build budget, hashed BEFORE leaving the row so
    no exchange ever carries text; canonicalization is one window over the
    gram hash; cover positions explode to at most n·|marked occurrences|;
    reconstruction collects each document's CUT POSITIONS into one int
    array and rewrites MAP-SIDE (array_except over 1..n, element_at back
    into the token array) — post-scan exchanges carry integer positions
    only, and only for documents that actually lose spans, never token
    text. No pair enumeration anywhere. Canonicalization is deliberately a MIN-STRUCT AGGREGATE plus
    an equi-join, not a window: a hot boilerplate gram (tens of millions
    of occurrences at 100 TB) would make one unsplittable window-sort
    partition, while the aggregate combines map-side and AQE can split the
    skewed probe join — same (min doc, pos) semantics, the oracle replays
    it as a window over the gate corpus."""
    toks = tokenize(text_col)
    base = docs.select(
        F.col(id_col).alias("_id"),
        toks.alias("toks"),
        # NULL text ⇒ NULL n in BOTH ANSI modes: with ansi.enabled=false
        # (the engine session default) size(NULL) is -1, which would leak
        # -1/-4 into n_tokens/n_removed; the oracle (len(NULL) in DuckDB)
        # and ANSI mode both say NULL. Guard explicitly, don't coalesce.
        F.when(toks.isNull(), F.lit(None)).otherwise(F.size(toks)).alias("n"),
    )
    occ = base.filter(F.col("n") >= n).select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - (n - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    # 16-byte BINARY md5, not the 32-char hex string (round
                    # 15, guide §2.3 "narrower types"): gh is internal —
                    # only grouped and joined on, never output — so halving
                    # the key halves the two gram-keyed exchanges' bytes
                    # with the identical 2⁻¹²⁸ collision class (measured
                    # 3.10 → 2.54 s noop at sf0.1; output byte-identical).
                    F.unhex(
                        F.md5(F.concat_ws(" ", F.slice("toks", i, n)))
                    ).alias("gh"),
                ),
            )
        ).alias("o"),
    ).select("_id", F.col("o.pos").alias("pos"), F.col("o.gh").alias("gh"))
    canon = (
        occ.groupBy("gh")
        .agg(
            F.min(F.struct("_id", "pos")).alias("c"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") > 1)  # unique grams excise nothing
        .select("gh", "c")
    )
    marked = (
        occ.join(canon, "gh")
        .filter(
            (F.col("_id") != F.col("c._id")) | (F.col("pos") != F.col("c.pos"))
        )  # every non-canonical occurrence of a dup gram
        .select("_id", "pos")
    )
    # Reconstruction via the CUT-POSITION SET (round 12): collect each
    # document's excised positions into one int array and rebuild the text
    # MAP-SIDE — kept positions are array_except(1..n, cut) (order-
    # preserving, hash-based), each mapped back through element_at(toks).
    # The former token-grain form (posexplode every token, anti-join, and a
    # collect_list carrying (pos, token) STRUCTS back through a doc-keyed
    # exchange) shuffled the whole corpus TEXT a second time; this shuffles
    # only integer positions, and only for documents that lose spans —
    # byte-identical output (A/B-asserted on the gate corpus), ~25% faster
    # at sf0.1, a wash only on the replicated probe corpus where every
    # position is boilerplate (SCALE.md round-12 note).
    cut = (
        marked.select(
            "_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias(
                "cpos"
            ),
        )
        .groupBy("_id")
        .agg(F.array_sort(F.array_distinct(F.collect_list("cpos"))).alias("cut"))
    )
    kept_pos = F.array_except(
        F.sequence(F.lit(1), F.col("n")),
        F.coalesce(F.col("cut"), F.array().cast("array<int>")),
    )
    return (
        base.join(cut, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("n").cast("long").alias("n_tokens"),
            (F.col("n") - F.size(kept_pos)).cast("long").alias("n_removed"),
            # coalesce: NULL text ⇒ NULL toks ⇒ the whole rebuild chain is
            # NULL, but the contract (and the DuckDB oracle) is '' — the
            # r12 cut-position rewrite dropped this and broke byte parity
            # on NULL-text corpora (ADVICE r12).
            F.coalesce(
                F.array_join(
                    F.transform(kept_pos, lambda p: F.element_at("toks", p)),
                    " ",
                ),
                F.lit(""),
            ).alias("cleaned_text"),
        )
    )
