"""Charset sniffing: the vectorized UTF-8 DFA against Python's own
decoder (adversarial + random byte strings), BOM precedence, high-byte
basis points, and the query fixture's verdict distribution."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from tilemaker_ray.stages.charset import charset_verdicts, \
    utf8_valid_mask


def _mask(payloads):
    lens = np.array([len(p) for p in payloads], np.int64)
    flat = np.frombuffer(b"".join(payloads), np.uint8) \
        if payloads else np.empty(0, np.uint8)
    return utf8_valid_mask(flat, lens)


ADVERSARIAL = [
    b"", b"a", b"abc", bytes(range(0x80)),          # pure ASCII
    "héllo".encode(), "日本語".encode(), "\U0001f600".encode(),
    b"\xc0\xaf",             # overlong '/'
    b"\xc1\xbf",             # overlong
    b"\xe0\x80\x80",         # overlong NUL (E0 then 80: invalid)
    b"\xe0\xa0\x80",         # U+0800 minimal valid
    b"\xed\x9f\xbf",         # U+D7FF valid
    b"\xed\xa0\x80",         # UTF-16 surrogate: invalid
    b"\xf0\x8f\xbf\xbf",     # overlong (F0 then 8F): invalid
    b"\xf0\x90\x80\x80",     # U+10000 minimal valid
    b"\xf4\x8f\xbf\xbf",     # U+10FFFF max valid
    b"\xf4\x90\x80\x80",     # > U+10FFFF: invalid
    b"\xf5\x80\x80\x80",     # F5 lead: invalid
    b"\xff", b"\xfe",
    b"\xc3",                 # truncated lead at end: invalid
    b"\xe4\xb8",             # truncated 3-byte: invalid
    b"ok\xc3\xa9tail",       # valid mid-string multibyte
    b"bad\x80tail",          # bare continuation: invalid
]


def _py_valid(b: bytes) -> bool:
    try:
        b.decode("utf-8", errors="strict")
        return True
    except UnicodeDecodeError:
        return False


def test_dfa_adversarial_vs_python():
    got = _mask(ADVERSARIAL)
    exp = [_py_valid(b) for b in ADVERSARIAL]
    assert got.tolist() == exp, list(zip(ADVERSARIAL, got, exp))


@settings(max_examples=300, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=40), min_size=1,
                max_size=8))
def test_dfa_random_vs_python(payloads):
    got = _mask(payloads)
    exp = [_py_valid(b) for b in payloads]
    assert got.tolist() == exp


def test_verdict_ladder_and_bom():
    payloads = [
        b"plain ascii",
        "café".encode(),
        b"\xb0\xb1legacy",
        b"\xef\xbb\xbfx",
        b"\xff\xfe" + "hi".encode("utf-16-le"),
        b"\xfe\xff" + "hi".encode("utf-16-be"),
        b"",
    ]
    v, bp = charset_verdicts(pa.array(payloads, pa.binary()))
    assert v.to_pylist() == ["ascii", "utf-8", "latin-1", "utf-8-bom",
                             "utf-16le", "utf-16be", "empty"]
    # high-byte basis points: 2 of 8 bytes in 'legacy' row
    assert bp.to_pylist()[2] == (2 * 10000) // 8
    assert bp.to_pylist()[0] == 0


def test_query_verdicts_match_python_codecs():
    """The query fixture at sf0.001: every staged verdict must agree
    with an independent Python-codecs re-derivation of the same
    payload rule."""
    import pyarrow.parquet as pq

    from tilemaker_ray.pipelines.queries import q_charset_docs

    got = q_charset_docs("/root/testdata/sf0.001").to_pandas()
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    exp = {}
    for i, txt in zip(t["doc_id"], t["text"]):
        raw = txt.encode("utf-8")
        v = i % 5
        if v == 0:
            p = ("é " + txt).encode("utf-8")
        elif v == 1:
            p = b"\xb0legacy " + raw
        elif v == 2:
            p = b"\xef\xbb\xbf" + raw
        elif v == 3:
            p = b"\xff\xfe" + txt.encode("utf-16-le")
        else:
            p = ("丁" + txt).encode("utf-8")[1:]
        if len(p) == 0:
            verdict = "empty"
        elif p[:3] == b"\xef\xbb\xbf":
            verdict = "utf-8-bom"
        elif p[:2] == b"\xff\xfe":
            verdict = "utf-16le"
        elif _py_valid(p):
            verdict = "ascii" if max(p) < 0x80 else "utf-8"
        else:
            verdict = "latin-1"
        c, s = exp.get(verdict, (0, 0))
        hb = sum(1 for b in p if b >= 0x80)
        exp[verdict] = (c + 1,
                        s + ((hb * 10000) // len(p) if p else 0))
    assert {r.verdict: (r.n, r.hi_bp_sum)
            for r in got.itertuples()} == exp
    # the fixture exercises every non-empty verdict branch
    assert {"utf-8", "latin-1", "utf-8-bom", "utf-16le"} <= set(exp)
