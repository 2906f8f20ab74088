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
        # this run re-measured MLP (should win) and added RPN + U-Net;
        # MLP appears TWICE (report() appends across resumed runs against
        # the same stream file) -- the newest row must win
        for m, s in [("U-Net v5 (128ch)", 500.0), ("MLP", 9.1),
                     ("MLP", 2.3), ("RPN x32", 60.0)]:
            f.write(json.dumps(_row(m, s, note="fresh")) + "\n")

    out = tmp_path / "table.md"
    # empty --models: no chip work, exercise only merge + render
    bench_all.main(["--models", "", "--out", str(out),
                    "--jsonl", str(tmp_path / "stream.jsonl"),
                    "--prior", str(fresh)])
    # the run itself measured nothing; --prior seeded the fresh rows,
    # deduped within the file (one MLP row, the newest)
    txt = out.read_text()
    assert "| MLP |" in txt and "| RPN x32 |" in txt
    assert txt.count("| MLP |") == 1 and "| MLP | 2.30 |" in txt

    # now merge prior + fresh the way a resumed run does (dedup by model,
    # newest wins, canonical order)
    rows = {}
    for f_ in (prior, fresh):
        for ln in open(f_):
            r = json.loads(ln)
            rows[r["model"]] = r
    order = {m: i for i, m in enumerate(
        ["MLP", "ED", "HSR", "cVAE", "RPN x32", "CNN",
         "U-Net v5 (128ch)"])}
    merged = sorted(rows.values(), key=lambda r: order.get(r["model"], 99))

    names = [r["model"] for r in merged]
    assert names == ["MLP", "HSR", "cVAE", "RPN x32", "U-Net v5 (128ch)"]
    mlp = next(r for r in merged if r["model"] == "MLP")
    assert mlp["note"] == "fresh" and mlp["s_per_epoch"] == 2.3


def test_transient_failure_retry_and_continue(tmp_path, monkeypatch):
    """The dev tunnel drops long remote compiles (broken pipe mid-RPN,
    observed twice); main() must retry a model on JaxRuntimeError and,
    if it keeps failing, move on so later models still get measured."""
    import jax

    calls = []

    def fake_bench(name, fac, spec, batch, pool, results,
                   chunk_epochs=None):
        calls.append(name)
        if name == "MLP" and calls.count("MLP") < 3:
            raise jax.errors.JaxRuntimeError("transport: Broken pipe")
        if name == "ED":  # persistent failure: must not kill the run
            raise jax.errors.JaxRuntimeError("transport: Broken pipe")
        results.append(_row(name, 1.0, note="fresh"))

    monkeypatch.setattr(bench_all, "bench_generic", fake_bench)
    monkeypatch.setattr(bench_all.time, "sleep", lambda s: None)
    out = tmp_path / "table.md"
    bench_all.main(["--models", "MLP,ED,HSR", "--out", str(out),
                    "--jsonl", str(tmp_path / "stream.jsonl")])

    # MLP: 2 failures + 1 success; ED: 3 failures then gave up; HSR ran
    assert calls.count("MLP") == 3 and calls.count("ED") == 3
    txt = out.read_text()
    assert "| MLP |" in txt and "| HSR |" in txt and "| ED |" not in txt


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
