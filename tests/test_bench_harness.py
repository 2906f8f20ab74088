"""The measured-epoch bench harness (scripts/bench_all.py) — the
crash-resume plumbing, not the measurements themselves.

The chip runs are long (a true 10M-sample epoch per model) over a
fragile dev tunnel, so the harness streams each measured row to a JSONL
and a rerun can seed from a prior run's file.  These tests pin that
contract: dedup by model name with fresh rows winning, canonical table
order, and the doc render."""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))

import bench_all  # noqa: E402


def _row(model, s_per_epoch, **kw):
    base = dict(model=model, s_per_epoch=s_per_epoch, wall_s=s_per_epoch,
                rows=1000, samples_per_s=1.0, tflops=1.0, mfu=0.1,
                vs_north_star=1.0, loss=0.5, note="prior")
    base.update(kw)
    return base


def test_prior_merge_dedup_and_order(tmp_path):
    """A rerun seeded with --prior keeps prior rows for models it did
    not re-measure, lets fresh rows win on collision, and renders the
    table in the canonical model order regardless of arrival order."""
    prior = tmp_path / "prior.jsonl"
    with open(prior, "w") as f:
        for m, s in [("cVAE", 0.7), ("MLP", 9.9), ("HSR", 1.7)]:
            f.write(json.dumps(_row(m, s)) + "\n")

    fresh = tmp_path / "fresh.jsonl"
    with open(fresh, "w") as f:
        # this run re-measured MLP (should win) and added RPN + U-Net
        for m, s in [("U-Net v5 (128ch)", 500.0), ("MLP", 2.3),
                     ("RPN x32", 60.0)]:
            f.write(json.dumps(_row(m, s, note="fresh")) + "\n")

    out = tmp_path / "table.md"
    # empty --models: no chip work, exercise only merge + render
    bench_all.main(["--models", "", "--out", str(out),
                    "--jsonl", str(tmp_path / "stream.jsonl"),
                    "--prior", str(fresh)])
    # the run itself measured nothing; --prior seeded the fresh rows
    txt = out.read_text()
    assert "| MLP |" in txt and "| RPN x32 |" in txt

    # now merge prior + fresh the way a resumed run does
    import argparse  # noqa: F401  (documenting: main() owns the CLI)
    rows = [json.loads(ln) for ln in open(fresh)]
    fresh_names = {r["model"] for r in rows}
    merged = [json.loads(ln) for ln in open(prior)
              if json.loads(ln)["model"] not in fresh_names] + rows
    order = {m: i for i, m in enumerate(
        ["MLP", "ED", "HSR", "cVAE", "RPN x32", "CNN",
         "U-Net v5 (128ch)"])}
    merged.sort(key=lambda r: order.get(r["model"], 99))

    names = [r["model"] for r in merged]
    assert names == ["MLP", "HSR", "cVAE", "RPN x32", "U-Net v5 (128ch)"]
    mlp = next(r for r in merged if r["model"] == "MLP")
    assert mlp["note"] == "fresh" and mlp["s_per_epoch"] == 2.3


def test_jsonl_streaming(tmp_path, monkeypatch):
    """report() appends the row to the stream file the moment it is
    measured (so a tunnel drop mid-run loses nothing)."""
    stream = tmp_path / "stream.jsonl"
    monkeypatch.setattr(bench_all, "_JSONL", str(stream))
    r1 = bench_all.report("MLP", wall=2.0, rows=bench_all.EPOCH,
                          flops=1e12, loss=0.1, note="n")
    r2 = bench_all.report("ED", wall=1.0, rows=bench_all.EPOCH,
                          flops=1e12, loss=0.2, note="n")
    rows = [json.loads(ln) for ln in open(stream)]
    assert [r["model"] for r in rows] == ["MLP", "ED"]
    assert rows[0] == r1 and rows[1] == r2
    assert r1["s_per_epoch"] == 2.0  # rows == EPOCH -> wall is s/epoch
