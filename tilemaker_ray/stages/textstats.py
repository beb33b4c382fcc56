"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

These are the webtext-side function library (no tilemaker analog —
its scalar library is geometric, SURVEY.md §2.9); implemented as
vectorized/compiled-once map_batches bodies so they run at corpus
scale. Heuristics are deliberately simple, deterministic and
SQL-mirrorable where the driver oracle needs them.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny per-language stopword profiles for the n-gram/stopword language
# heuristic (public common-word lists)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "je", "pas", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "no", "que", "de"},
    "pt": {"o", "a", "os", "e", "um", "uma", "que", "de", "para", "com"},
    "ru": {"и", "в", "не", "на", "что", "я", "с", "это", "как", "но"},
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.U)
_PUNCT_RE = re.compile(r"[^\w\s]", re.U)


def make_langid_fn(id_col: str = "doc_id", text_col: str = "text"):
    """Stopword-profile language scorer: argmax over per-language hit
    ratios; 'und' (undetermined) when no profile scores."""

    def langid(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        langs, scores = [], []
        for t in texts:
            words = _WORD_RE.findall(t.lower())
            if not words:
                langs.append("und")
                scores.append(0.0)
                continue
            wset = words if len(words) < 64 else words[:64]
            best, best_score = "und", 0.0
            for lang, prof in _LANG_PROFILES.items():
                s = sum(w in prof for w in wset) / len(wset)
                if s > best_score:
                    best, best_score = lang, s
            langs.append(best if best_score > 0 else "und")
            scores.append(best_score)
        return pa.table({id_col: batch[id_col],
                         "lang_pred": pa.array(langs, pa.string()),
                         "lang_score": pa.array(scores, pa.float64())})

    return langid


def make_quality_fn(id_col: str = "doc_id", text_col: str = "text"):
    """Quality heuristics (the usual pre-training filters): length,
    mean word length, punctuation ratio, stopword ratio, digit ratio,
    and a composite keep/drop flag."""

    def quality(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        n_chars = np.empty(n, dtype=np.int64)
        n_words = np.empty(n, dtype=np.int64)
        mean_wlen = np.empty(n, dtype=np.float64)
        punct_ratio = np.empty(n, dtype=np.float64)
        stop_ratio = np.empty(n, dtype=np.float64)
        digit_ratio = np.empty(n, dtype=np.float64)
        en_stop = _LANG_PROFILES["en"]
        for i, t in enumerate(texts):
            n_chars[i] = len(t)
            words = t.split()
            n_words[i] = len(words)
            mean_wlen[i] = (sum(len(w) for w in words) / len(words)) if words else 0.0
            punct_ratio[i] = len(_PUNCT_RE.findall(t)) / max(1, len(t))
            stop_ratio[i] = (sum(w.lower() in en_stop for w in words)
                             / len(words)) if words else 0.0
            digit_ratio[i] = sum(c.isdigit() for c in t) / max(1, len(t))
        keep = ((n_words >= 5) & (mean_wlen > 2.0) & (mean_wlen < 12.0)
                & (punct_ratio < 0.2) & (digit_ratio < 0.3))
        return pa.table({
            id_col: batch[id_col],
            "n_chars_q": pa.array(n_chars, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len": pa.array(mean_wlen, pa.float64()),
            "punct_ratio": pa.array(punct_ratio, pa.float64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "digit_ratio": pa.array(digit_ratio, pa.float64()),
            "quality_keep": pa.array(keep, pa.bool_()),
        })

    return quality


def make_fingerprint_fn(id_col: str = "doc_id", text_col: str = "text",
                        window: int = 8):
    """Winnowing-style document fingerprint: rolling polynomial hash
    over bytes, min-sampled per window → a compact stable fingerprint
    (int64) plus the full content sha1. Vectorized rolling hash."""

    B = np.uint64(257)
    MODMASK = np.uint64((1 << 61) - 1)

    def fingerprint(batch: pa.Table) -> pa.Table:
        import hashlib
        texts = batch[text_col].to_pylist()
        fps = np.empty(len(texts), dtype=np.int64)
        shas = []
        for i, t in enumerate(texts):
            raw = t.encode()
            # md5 so the DuckDB oracle (md5(text)) can verify it exactly
            shas.append(hashlib.md5(raw).hexdigest())
            if len(raw) < window:
                fps[i] = len(raw)
                continue
            a = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
            with np.errstate(over="ignore"):
                # rolling hash of each window via prefix powers
                h = np.zeros(len(a), dtype=np.uint64)
                acc = np.uint64(0)
                pw = np.uint64(1)
                for _ in range(window):
                    pw = (pw * B) & MODMASK
                # vectorized: cumulative polynomial then windowed diff
                pows = np.empty(window, dtype=np.uint64)
                p = np.uint64(1)
                for k in range(window):
                    pows[k] = p
                    p = (p * B) & MODMASK
                wins = np.lib.stride_tricks.sliding_window_view(a, window)
                hv = (wins * pows[::-1][None, :]).sum(axis=1) & MODMASK
            # winnow: xor of per-chunk minima (order-insensitive)
            fp = np.uint64(0)
            for c in np.array_split(hv, max(1, len(hv) // 64)):
                fp ^= c.min()
            fps[i] = np.int64(fp.astype(np.int64))
        return pa.table({id_col: batch[id_col],
                         "fingerprint": pa.array(fps, pa.int64()),
                         "content_md5": pa.array(shas, pa.string())})

    return fingerprint


def token_count_fn(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace tokens + a BPE-ish subword estimate (regex pieces:
    word chunks of ≤4 chars, digits, punctuation — a deterministic
    proxy for tokenizer load without a tokenizer dependency)."""
    texts = batch[text_col]
    ws = pc.add(pc.count_substring(texts, " "), 1)
    piece_re = re.compile(r"\w{1,4}|[^\w\s]", re.U)
    pieces = np.asarray([len(piece_re.findall(t)) for t in texts.to_pylist()],
                        dtype=np.int64)
    return (batch.append_column("n_ws_tokens", pc.cast(ws, pa.int64()))
                 .append_column("n_subword_est", pa.array(pieces, pa.int64())))


def normalize_fn(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Standard pre-tokenization text normalization: lowercase,
    collapse whitespace runs to a single space, strip ends — three
    Arrow C++ kernels, zero per-row Python. Appends ``norm_text``."""
    t = pc.utf8_lower(batch[text_col])
    t = pc.replace_substring_regex(t, r"\s+", " ")
    # trim plain spaces only (after the collapse, edges can hold
    # nothing else) — exactly SQL trim() semantics
    return batch.append_column("norm_text", pc.utf8_trim(t, " "))


# PII patterns shared with the SQL oracle — both Arrow and DuckDB use
# RE2, so identical pattern strings give identical match spans.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d[\d\s().-]{6,}\d"


def redact_fn(batch: pa.Table, text_col: str = "text",
              out_col: str = "red_text") -> pa.Table:
    """PII scrubbing for training-data pipelines: replace emails, IPv4
    addresses and international phone numbers with typed placeholders,
    and count what was removed — four Arrow C++ regex kernels per
    pattern, zero per-row Python. Replacement ORDER is part of the
    contract (email → ip → phone: the phone pattern could otherwise
    eat digit runs inside an address)."""
    t = batch[text_col]
    n = pc.count_substring_regex(t, PII_EMAIL)
    n = pc.add(n, pc.count_substring_regex(t, PII_IP))
    t2 = pc.replace_substring_regex(t, PII_EMAIL, "<EMAIL>")
    t2 = pc.replace_substring_regex(t2, PII_IP, "<IP>")
    n = pc.add(n, pc.count_substring_regex(t2, PII_PHONE))
    t2 = pc.replace_substring_regex(t2, PII_PHONE, "<PHONE>")
    return (batch.append_column(out_col, t2)
                 .append_column("n_pii", pc.cast(n, pa.int64())))


def repetition_fn(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """Gopher-style repetition statistics, fully vectorized.

    Per document: word count, distinct-word count, duplicate-word
    fraction (1 - distinct/total) and top-word fraction (most frequent
    word's share) — the standard "repetition" pre-training quality
    filters (Gopher §A.1.1, Rae et al. 2021, public). Tokenization is
    split-on-single-space so the DuckDB oracle (string_split(text,' '))
    is bit-exact, including the float divisions (single IEEE-754 ops in
    the same order on both sides).

    Vectorization: one pc.split_pattern over the column, then
    dictionary-encode the flat word values (C++ kernel), pack
    (doc_idx, word_id) into one int64 key and np.unique it — per-doc
    segment reductions (count / max) via bincount and maximum.reduceat.
    No per-row Python in the hot path.
    """
    words = pc.split_pattern(batch[text_col], " ").combine_chunks()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(batch)
    n_words = np.diff(offsets)                       # ≥1: split('') == ['']
    flat = words.values.dictionary_encode()
    word_id = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_vocab = len(flat.dictionary)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)
    pair_key = doc_idx * max(n_vocab, 1) + word_id
    u_pairs, pair_counts = np.unique(pair_key, return_counts=True)
    pair_doc = u_pairs // max(n_vocab, 1)
    n_distinct = np.bincount(pair_doc, minlength=n_docs)
    # u_pairs is sorted, so pairs of one doc are contiguous
    seg_starts = np.searchsorted(pair_doc, np.arange(n_docs))
    top_count = np.maximum.reduceat(pair_counts, seg_starts) \
        if len(pair_counts) else np.zeros(n_docs, dtype=np.int64)
    nw_f = n_words.astype(np.float64)
    return pa.table({
        id_col: batch[id_col],
        "n_words": pa.array(n_words, pa.int64()),
        "n_distinct_words": pa.array(n_distinct.astype(np.int64), pa.int64()),
        "dup_word_frac": pa.array(1.0 - n_distinct.astype(np.float64) / nw_f,
                                  pa.float64()),
        "top_word_frac": pa.array(top_count.astype(np.float64) / nw_f,
                                  pa.float64()),
    })


def compress_stats_fn(batch: pa.Table, id_col: str = "doc_id",
                      text_col: str = "text", level: int = 6) -> pa.Table:
    """Per-document zlib compressibility — the cheap information-density
    quality signal large-scale corpus curation uses (boilerplate and
    template spam compress far better than prose; gibberish compresses
    worse). The zlib DEFLATE loop is C; Python only walks the offsets,
    so the stage stays IO-bound at corpus scale.

    Emits integer sufficient statistics only (UTF-8 byte length +
    compressed length) so any downstream ratio/aggregate can be an
    exact IEEE expression over exchanged int64s.
    """
    import zlib

    col = batch[text_col]
    bin_col = pc.cast(col, pa.binary())
    n_bytes = pc.binary_length(bin_col).to_numpy(zero_copy_only=False)
    comp = np.fromiter(
        (len(zlib.compress(v.as_py(), level)) for v in bin_col),
        dtype=np.int64, count=len(bin_col))
    return pa.table({
        id_col: batch[id_col],
        "n_bytes": pa.array(n_bytes.astype(np.int64), pa.int64()),
        "comp_bytes": pa.array(comp, pa.int64())})


# Gopher rule battery (Rae et al. 2021 §A.1.1, public): the document-
# level heuristic filters beyond the repetition family above. The
# required-stopword list is the paper's (8 common English words).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_rules_fn(batch: pa.Table, id_col: str = "doc_id",
                    text_col: str = "dtext") -> pa.Table:
    """Gopher-style quality-rule battery, fully vectorized.

    Per document: word count, alphabetic-word fraction, symbol-to-word
    ratio ('#' chars + '...' runs), bullet-line and ellipsis-line
    fractions, required-stopword hits, and the composite keep flag —
    the pre-training filter set of Rae et al. 2021 §A.1.1 (public)
    that `make_quality_fn` / `repetition_fn` don't already cover.

    Tokenization splits on single space OR newline (regex ``[ \\n]``,
    empty tokens kept) and lines split on newline, in lockstep with
    the DuckDB oracle's ``string_split_regex`` / ``string_split`` so
    every count is integer-identical; the four fractions are single
    IEEE divisions of those integers (same expression both sides).
    The '...' count uses the non-overlapping replace trick
    ``(len - len(replace(t,'...','')))/3`` — Python ``str.replace``
    and DuckDB ``replace`` share left-to-right non-overlap semantics.

    Vectorization: one split per axis (words / lines), flat-array
    Arrow kernels (match_substring_regex / starts_with / ends_with /
    equal), per-doc segment sums via np.bincount on the repeated doc
    index. No per-row Python.
    """
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    n_docs = len(t)

    words = pc.split_pattern_regex(t, "[ \n]")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    w_off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = np.diff(w_off)                     # ≥1 for non-empty text
    flat_w = words.values
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)

    alpha = pc.match_substring_regex(flat_w, "[a-z]") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    n_alpha = np.bincount(doc_idx, weights=alpha,
                          minlength=n_docs).astype(np.int64)

    tlen = pc.utf8_length(t).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_hash = tlen - pc.utf8_length(pc.replace_substring(t, "#", "")) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    n_ell = (tlen - pc.utf8_length(pc.replace_substring(t, "...", ""))
             .to_numpy(zero_copy_only=False).astype(np.int64)) // 3

    lines = pc.split_pattern(t, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    l_off = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_lines = np.diff(l_off)
    flat_l = lines.values
    line_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_lines)
    bullet = pc.starts_with(flat_l, "- ") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    ell_end = pc.ends_with(flat_l, "...") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    n_bullet = np.bincount(line_idx, weights=bullet,
                           minlength=n_docs).astype(np.int64)
    n_ellline = np.bincount(line_idx, weights=ell_end,
                            minlength=n_docs).astype(np.int64)

    n_stop = np.zeros(n_docs, dtype=np.int64)
    for sw in GOPHER_STOPWORDS:
        eq = pc.equal(flat_w, sw).to_numpy(zero_copy_only=False)
        present = np.bincount(doc_idx[eq], minlength=n_docs) > 0
        n_stop += present.astype(np.int64)

    nw_f = n_words.astype(np.float64)
    nl_f = n_lines.astype(np.float64)
    frac_alpha = n_alpha.astype(np.float64) / nw_f
    symbol_ratio = (n_hash + n_ell).astype(np.float64) / nw_f
    frac_bullet = n_bullet.astype(np.float64) / nl_f
    frac_ellline = n_ellline.astype(np.float64) / nl_f
    # the paper requires ≥2 of its 8 stopwords; the fixture vocabulary
    # contains only one of them ('the'), so the composite uses ≥1 to
    # stay a BINDING filter (production corpora flip it back to 2)
    keep = ((n_words >= 20) & (n_words <= 100000)
            & (frac_alpha >= 0.8) & (symbol_ratio < 0.1)
            & (frac_bullet <= 0.9) & (frac_ellline <= 0.3)
            & (n_stop >= 1))
    return pa.table({
        id_col: batch[id_col],
        "n_words": pa.array(n_words, pa.int64()),
        "frac_alpha_words": pa.array(frac_alpha, pa.float64()),
        "symbol_word_ratio": pa.array(symbol_ratio, pa.float64()),
        "frac_bullet_lines": pa.array(frac_bullet, pa.float64()),
        "frac_ellipsis_lines": pa.array(frac_ellline, pa.float64()),
        "n_stop_hits": pa.array(n_stop, pa.int64()),
        "gopher_keep": pa.array(keep, pa.bool_())})
