"""redact_fn: planted PII, replacement order, counts."""

import pyarrow as pa


def test_redact_planted(ray_session):
    from tilemaker_ray.stages.textstats import redact_fn
    t = pa.table({"text": pa.array([
        "mail a.b+c@foo-bar.co.uk and d@e.io now",
        "server at 192.168.0.1 or 8.8.8.8",
        "call +1 (415) 555-0142 today",
        "mixed j@k.com via 10.0.0.7 dial +44 20 7946 0958",
        "clean text, no pii at all",
    ])})
    out = redact_fn(t)
    red = out["red_text"].to_pylist()
    assert red[0] == "mail <EMAIL> and <EMAIL> now"
    assert red[1] == "server at <IP> or <IP>"
    assert red[2] == "call <PHONE> today"
    assert red[3] == "mixed <EMAIL> via <IP> dial <PHONE>"
    assert red[4] == "clean text, no pii at all"
    assert out["n_pii"].to_pylist() == [2, 2, 1, 3, 0]


def test_redact_order_ip_before_phone(ray_session):
    # a phone-like digit run that is actually an IP must become <IP>,
    # not be half-eaten by the phone pattern
    from tilemaker_ray.stages.textstats import redact_fn
    t = pa.table({"text": pa.array(["ping +9 1.2.3.4 ok"])})
    out = redact_fn(t)
    assert "<IP>" in out["red_text"].to_pylist()[0]
