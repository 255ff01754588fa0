"""Tests for operators/bpe.py — parity with an independent pure-Python
Sennrich BPE implementation, determinism, and encode invariants."""

from __future__ import annotations

import collections
import re

from pyspark.sql import functions as F

from data_lake_medallion_architecture_project_spark.operators.bpe import (
    _END,
    encode_with_merges,
    train_bpe,
    word_frequencies,
)

from tests.conftest import SF_SMALL


# ---- independent reference implementation (Sennrich et al. 2016, fig. 2) ----


def _ref_train(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    vocab = {" ".join(list(w) + [_END]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, c in vocab.items():
            sym = w.split(" ")
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # arg-max with the same total tiebreak the Spark trainer uses.
        (a, b), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        merges.append((a, b))
        pat = re.compile(r"(?<!\S)" + re.escape(a + " " + b) + r"(?!\S)")
        vocab = {pat.sub(a + b, w): c for w, c in vocab.items()}
    return merges


def _small_docs(spark):
    return (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
    )


def test_train_matches_reference_implementation(spark):
    docs = _small_docs(spark)
    counts = {
        r["word"]: r["n"] for r in word_frequencies(docs).collect()
    }
    got = train_bpe(docs, n_merges=20)
    want = _ref_train(counts, 20)
    assert got == want
    assert len(got) == 20  # corpus is rich enough that no early stop fires


def test_train_is_deterministic(spark):
    docs = _small_docs(spark)
    assert train_bpe(docs, n_merges=10) == train_bpe(docs, n_merges=10)


def test_merges_nest(spark):
    # The first k merges of a longer run equal a shorter run exactly —
    # the training order is a total order, not an artifact of n_merges.
    docs = _small_docs(spark)
    m20 = train_bpe(docs, n_merges=20)
    m5 = train_bpe(docs, n_merges=5)
    assert m20[:5] == m5


def test_encode_roundtrip_and_vocab_closure(spark):
    docs = _small_docs(spark)
    merges = train_bpe(docs, n_merges=30)
    enc = encode_with_merges(docs, merges)
    rows = enc.collect()
    assert rows
    learned = {a + b for a, b in merges}
    for r in rows:
        # Lossless: pieces concatenate back to the word (+ end marker).
        assert "".join(r["pieces"]) == r["word"] + _END
        # Closed: every multi-char piece is a learned merge product
        # (or a bare char + end marker).
        for p in r["pieces"]:
            base = p[:-len(_END)] if p.endswith(_END) else p
            assert p in learned or len(base) <= 1 or base in learned or p == _END
    # Compression: learned merges must actually shorten common words.
    n_words = len(rows)
    n_pieces = sum(len(r["pieces"]) for r in rows)
    n_chars = sum(len(r["word"]) + 1 for r in rows)
    assert n_pieces < n_chars  # strictly better than char-level


def test_encode_word_count_preserved(spark):
    docs = _small_docs(spark)
    merges = train_bpe(docs, n_merges=5)
    enc = encode_with_merges(docs, merges)
    n_tokens = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .count()
    )
    assert enc.count() == n_tokens


# ---- the hash-certified flat-string encode (plans/tokenization.py) ----


def test_pinned_merges_match_fresh_fit(spark):
    """The pinned merge table (plans/_pinned_bpe.py) must still equal a
    fresh deterministic fit on its pinned corpus — the logreg/PCA drift
    guard applied to the tokenizer tier."""
    from data_lake_medallion_architecture_project_spark.plans._pinned_bpe import (
        _BPE_MERGES,
        _BPE_N_MERGES,
        _BPE_SF_DIR,
    )
    from data_lake_medallion_architecture_project_spark.sources.readers import load_table

    docs = load_table(spark, _BPE_SF_DIR, "documents")
    assert train_bpe(docs, n_merges=_BPE_N_MERGES) == _BPE_MERGES


def test_certified_counts_match_canonical_encoder(spark):
    """bpe_encoded_token_counts (the 48-deep replace chain, pure JVM) must
    agree per document with the canonical lowest-rank-first encoder
    (encode_with_merges, the pandas-UDF reference) — the replace-chain
    equivalence argument, proven on real corpus data."""
    from data_lake_medallion_architecture_project_spark.plans._pinned_bpe import (
        _BPE_MERGES,
    )
    from data_lake_medallion_architecture_project_spark.plans.tokenization import (
        bpe_encoded_token_counts,
    )
    from data_lake_medallion_architecture_project_spark.sources.readers import load_table

    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
        for r in bpe_encoded_token_counts(spark, SF_SMALL).collect()
    }
    docs = load_table(spark, SF_SMALL, "documents")
    want = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in encode_with_merges(docs, _BPE_MERGES)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.size("pieces")).alias("n_pieces"),
        )
        .collect()
    }
    assert len(got) == docs.count()
    for doc_id, counts in want.items():
        assert got[doc_id] == counts, doc_id


def test_certified_counts_adversarial_shapes(spark, tmp_path):
    """Constructed edge cases for the flat-string encode: repeated-pair
    words (the non-overlapping leftmost-merge semantics), multi-space
    runs, quotes, a newline INSIDE a whitespace token, empty and
    single-char texts — all must match the canonical encoder."""
    from data_lake_medallion_architecture_project_spark.plans._pinned_bpe import (
        _BPE_MERGES,
    )
    from data_lake_medallion_architecture_project_spark.plans.tokenization import (
        bpe_encoded_token_counts,
    )

    rows = [
        (1, "erererer er rere"),          # chained occurrences of merge ('e','r')
        (2, "  double  spaces   x"),      # empty split cells are skipped
        (3, "it's \"quoted\" o'clock"),   # SQL-literal escaping in the oracle
        (4, "line\nbreak inside token"),  # \n is a char, not a separator
        (5, ""),                          # no words at all
        (6, "z"),                         # single char + </w>
        (7, "customer customer filter"),  # words that fully merge
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
        for r in bpe_encoded_token_counts(spark, str(tmp_path)).collect()
    }
    want = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in encode_with_merges(docs, _BPE_MERGES)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.size("pieces")).alias("n_pieces"),
        )
        .collect()
    }
    assert got[5] == (0, 0)  # empty text: zero words, zero pieces
    for doc_id, counts in want.items():
        assert got[doc_id] == counts, doc_id


def test_vocab_tier_equals_flat_tier(spark, tmp_path):
    """bpe_token_counts_vocab (occurrence-deduped scale tier) must emit
    EXACTLY the flat chain's per-document counts — on the real corpus and
    on the adversarial shapes."""
    from data_lake_medallion_architecture_project_spark.plans.tokenization import (
        bpe_encoded_token_counts,
        bpe_token_counts_vocab,
    )

    def both(sf_dir):
        a = {
            r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
            for r in bpe_encoded_token_counts(spark, sf_dir).collect()
        }
        b = {
            r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
            for r in bpe_token_counts_vocab(spark, sf_dir).collect()
        }
        return a, b

    a, b = both(SF_SMALL)
    assert a == b and len(a) == 500

    rows = [
        (1, "erererer er rere"),
        (2, "  double  spaces   x"),
        (3, ""),
        (4, "customer customer filter"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    a, b = both(str(tmp_path))
    assert a == b
    assert a[3] == (0, 0)  # the empty doc survives the left join as zeros


def test_piece_frequencies_conserve_token_mass(spark):
    """The corpus piece-frequency table and the per-document count query
    must agree on total mass: Σ n_occurrences == Σ n_bpe_tokens. Piece
    strings carry no guard bytes, and every piece is either a learned
    merge product or a single char / char+marker residue."""
    from pyspark.sql import functions as F

    from data_lake_medallion_architecture_project_spark.plans._pinned_bpe import (
        _BPE_MERGES,
    )
    from data_lake_medallion_architecture_project_spark.plans.tokenization import (
        bpe_encoded_token_counts,
        bpe_piece_frequencies,
    )

    freq = bpe_piece_frequencies(spark, SF_SMALL).collect()
    total_occ = sum(r["n_occurrences"] for r in freq)
    total_docs = (
        bpe_encoded_token_counts(spark, SF_SMALL)
        .agg(F.sum("n_bpe_tokens"))
        .collect()[0][0]
    )
    assert total_occ == total_docs

    merged_symbols = {a + b for a, b in _BPE_MERGES}
    for r in freq:
        p = r["piece"]
        assert "\x1f" not in p and "\x1e" not in p
        assert (
            p in merged_symbols
            or len(p) == 1
            or p == "</w>"
            or (p.endswith("</w>") and len(p) == 5)  # single char + marker
        ), p


# ---- randomized attack on the flat-chain equivalence claim ----


def _flat_chain_pieces(word: str, merges) -> list[str]:
    """Pure-Python mirror of the certified SQL/JVM flat encoding: guarded
    rep → rank-order replace chain → pieces (the piece-frequency
    extraction: strip the outer guards, split on the double guard).
    Python str.replace is left-to-right non-overlapping, exactly like
    Spark's replace() and DuckDB's replace()."""
    SEP = "\x1f"
    rep = SEP + (SEP + SEP).join(list(word) + [_END]) + SEP
    for a, b in merges:
        rep = rep.replace(f"{SEP}{a}{SEP}{SEP}{b}{SEP}", f"{SEP}{a}{b}{SEP}")
    return rep[1:-1].split(SEP + SEP)


def test_flat_chain_equals_canonical_encode_property():
    """Hypothesis attack on the core equivalence argument (a later merge
    can never create an occurrence of an earlier pair, so rank-order
    replace passes == canonical lowest-rank-first encoding): random tiny-
    alphabet corpora maximize pathological overlapping/chained merges
    ('aa'+'a', merged symbols recombining, marker merges)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_lake_medallion_architecture_project_spark.operators.bpe import _encode_word

    words_strategy = st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8), min_size=2, max_size=25
    )

    @settings(max_examples=300, deadline=None)
    @given(words_strategy)
    def inner(words):
        counts = collections.Counter(words)
        merges = _ref_train(dict(counts), 12)
        rank = {p: i for i, p in enumerate(merges)}
        for w in set(words):
            assert _flat_chain_pieces(w, merges) == _encode_word(w, rank), (
                w,
                merges,
            )

    inner()


def test_pinned_merge_results_are_distinct():
    """ADVICE r12: the replace-chain equivalence proof assumes no two
    merges concatenate to the same symbol string (('a','bc') vs ('ab','c')
    → 'abc'). tools/pin_bpe.py now asserts this before writing the table;
    this pins the invariant on the SHIPPED table so a hand-edited
    _pinned_bpe.py is caught too."""
    from data_lake_medallion_architecture_project_spark.plans._pinned_bpe import _BPE_MERGES

    results = [a + b for a, b in _BPE_MERGES]
    assert len(results) == len(set(results))
