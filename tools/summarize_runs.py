"""Summarise fine-tuning runs into CSV / markdown / LaTeX tables.

Framework-native analog of the reference's TensorBoard postprocessing
(``/root/reference/notebooks/few-bit-backward/exp-fine-tuning-glue-post.py``):
scans a log directory for runs written by
:class:`fewbit_tpu.metrics.MetricsLogger`, picks the best eval metric per
(task, param) run, and pivots into a param x task summary.

    python tools/summarize_runs.py logs/ --csv summary.csv --tex table.tex
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from fewbit_tpu.metrics import (DEFAULT_METRICS, summarize, to_csv, to_latex,
                                to_markdown)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("log_dir", type=Path)
    ap.add_argument("--metrics", nargs="+", default=list(DEFAULT_METRICS))
    ap.add_argument("--csv", type=Path, default=None)
    ap.add_argument("--tex", type=Path, default=None)
    ap.add_argument("--scale", type=float, default=100.0,
                    help="value multiplier for display (default: percent)")
    args = ap.parse_args()

    rows = summarize(args.log_dir, metrics=args.metrics)
    if not rows:
        print(f"no runs with {args.metrics} under {args.log_dir}",
              file=sys.stderr)
        return 1
    if args.csv:
        args.csv.write_text(to_csv(rows))
        print("wrote", args.csv, file=sys.stderr)
    if args.tex:
        args.tex.write_text(to_latex(rows, scale=args.scale))
        print("wrote", args.tex, file=sys.stderr)
    print(to_markdown(rows, scale=args.scale), end="")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
