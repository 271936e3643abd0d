"""redact_batch kernel semantics on real PII-shaped strings."""
import pyarrow as pa

from pcompress_ray.stages.pii import redact_batch


def test_redact_batch_patterns():
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail a.b+c@sub.example.org and d@e.io now",
            "server at 192.168.0.1 and 10.0.0.7, version 1.2 unchanged",
            "call 555-0199 or 123-4567; order 12-3456 stays",
            None,
        ]),
    })
    out = redact_batch(t)
    assert out["n_email"].to_pylist() == [2, 0, 0, 0]
    assert out["n_ipv4"].to_pylist() == [0, 2, 0, 0]
    assert out["n_phone"].to_pylist() == [0, 0, 2, 0]
    red = out["red_text"].to_pylist()
    assert red[0] == "mail <EMAIL> and <EMAIL> now"
    assert red[1] == "server at <IP> and <IP>, version 1.2 unchanged"
    assert red[2] == "call <PHONE> or <PHONE>; order 12-3456 stays"
    assert red[3] == ""


def test_redact_batch_order_no_reentry():
    # placeholders must not be matched by later patterns
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["x@y.com 1.2.3.4 555-1234"])})
    out = redact_batch(t)
    assert out["red_text"].to_pylist() == ["<EMAIL> <IP> <PHONE>"]
