"""PII redaction: pattern coverage, sequential-application semantics,
vectorized counts."""
import pyarrow as pa

from chronographer_ray.stages.pii import redact_batch, redact_dataset


def _redact(texts):
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = redact_batch(t)
    return out["clean_text"].to_pylist(), out["n_redactions"].to_pylist()


def test_redacts_email_phone_ip():
    clean, n = _redact(
        ["write bob.smith+x@corp.example.org today",
         "call +44 201 55503 now",
         "server at 192.168.0.1 down",
         "clean text with nothing"]
    )
    assert clean == [
        "write <EMAIL> today",
        "call <PHONE> now",
        "server at <IP> down",
        "clean text with nothing",
    ]
    assert n == [1, 1, 1, 0]


def test_sequential_order_email_before_phone_and_ip():
    # the email is consumed first, so its digits/dots never feed the
    # phone or IPv4 patterns; the bare IP next to it still matches
    clean, n = _redact(["a1.2.3.4@b.co 1.2.3.4"])
    assert clean == ["<EMAIL> <IP>"]
    assert n == [2]


def test_ip_word_boundary():
    clean, n = _redact(["x10.0.3.7 and 10.0.3.7"])
    # leading word char kills the left \b for the first candidate
    assert clean == ["x10.0.3.7 and <IP>"]
    assert n == [1]


def test_multiple_matches_counted():
    clean, n = _redact(["a@b.co c@d.org 1.2.3.4 +1 555 1234"])
    assert clean == ["<EMAIL> <EMAIL> <IP> <PHONE>"]
    assert n == [4]


def test_redact_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [{"doc_id": 1, "text": "mail a@b.co"}, {"doc_id": 2, "text": "ok"}]
    )
    rows = {r["doc_id"]: r for r in redact_dataset(ds).take_all()}
    assert rows[1]["clean_text"] == "mail <EMAIL>"
    assert rows[1]["n_redactions"] == 1 and rows[2]["n_redactions"] == 0


def test_unicode_normalize_batch():
    import pyarrow as pa

    from chronographer_ray.stages.text import unicode_normalize_batch

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "CAFE" + chr(769) + "  x",   # combining accent + double space
                "A\tB\x01C",                  # control chars
                "plain ascii",
            ],
        }
    )
    out = unicode_normalize_batch(t)
    got = out["norm_text"].to_pylist()
    assert got[0] == "café x" and len(got[0]) == 6  # composed single é
    assert got[1] == "a b c"
    assert got[2] == "plain ascii"
    assert out["n_chars"].to_pylist() == [6, 5, 11]
