"""Metrics logging + run summarisation (the reference's TB-postprocessing
pipeline analog, exp-fine-tuning-glue-post.py:19-95)."""

import json

from fewbit_tpu.metrics import (MetricsLogger, pivot, read_run, summarize,
                                to_csv, to_latex, to_markdown)


def _write_run(root, param, task, records):
    with MetricsLogger(root / param / task, task=task, param=param) as ml:
        for step, tag, value in records:
            ml.log(step, **{tag: value})


def test_logger_roundtrip(tmp_path):
    _write_run(tmp_path, "gelu3", "mrpc",
               [(1, "train/loss", 0.9), (10, "eval/accuracy", 0.81),
                (20, "eval/accuracy", 0.86)])
    meta, records = read_run(tmp_path / "gelu3" / "mrpc")
    assert meta == {"task": "mrpc", "param": "gelu3"}
    assert records == [
        {"step": 1, "tag": "train/loss", "value": 0.9},
        {"step": 10, "tag": "eval/accuracy", "value": 0.81},
        {"step": 20, "tag": "eval/accuracy", "value": 0.86},
    ]


def test_summarize_picks_best_eval_metric(tmp_path):
    _write_run(tmp_path, "gelu3", "mrpc",
               [(10, "eval/accuracy", 0.81), (20, "eval/accuracy", 0.86),
                (30, "eval/accuracy", 0.84)])
    _write_run(tmp_path, "exact", "mrpc", [(10, "eval/accuracy", 0.88)])
    _write_run(tmp_path, "exact", "cola",
               [(10, "eval/matthews_correlation", 0.55)])
    rows = summarize(tmp_path)
    by_key = {(r["param"], r["task"]): r["value"] for r in rows}
    # best (max) value per run, first matching metric wins
    assert by_key[("gelu3", "mrpc")] == 0.86
    assert by_key[("exact", "mrpc")] == 0.88
    assert by_key[("exact", "cola")] == 0.55


def test_pivot_and_formats(tmp_path):
    rows = [
        {"task": "mrpc", "param": "exact", "metric": "eval/accuracy",
         "value": 0.88},
        {"task": "mrpc", "param": "gelu3", "metric": "eval/accuracy",
         "value": 0.86},
        {"task": "cola", "param": "exact",
         "metric": "eval/matthews_correlation", "value": 0.55},
    ]
    params, tasks, cells = pivot(rows)
    assert tasks == ["cola", "mrpc"]
    assert cells[("gelu3", "mrpc")] == 0.86

    md = to_markdown(rows)
    assert "| COLA | MRPC |" in md
    assert "88.00" in md
    assert "—" in md  # gelu3 x cola is missing

    tex = to_latex(rows)
    assert r"\toprule" in tex and r"\bottomrule" in tex
    assert "COLA & MRPC" in tex.replace("& COLA & MRPC", "COLA & MRPC")
    assert "86.00" in tex

    csv = to_csv(rows)
    assert csv.splitlines()[0] == "task,param,metric,value"
    assert "mrpc,gelu3,eval/accuracy,0.86" in csv


def test_summarize_falls_back_to_dir_names(tmp_path):
    # Runs without meta.json (e.g. hand-assembled) label by directory names.
    d = tmp_path / "rand20" / "sst2"
    d.mkdir(parents=True)
    with open(d / "metrics.jsonl", "w") as fh:
        fh.write(json.dumps(
            {"step": 5, "tag": "eval/accuracy", "value": 0.9}) + "\n")
    rows = summarize(tmp_path)
    assert rows == [{"task": "sst2", "param": "rand20",
                     "metric": "eval/accuracy", "value": 0.9}]
