"""Compare a reader-test metrics.json to the reference's released numbers.

The reference's ground truth for the ViQuAE reading-comprehension run is
EM 21.96 / F1 25.38 (/root/reference/experiments/rc/viquae/metrics.json —
seed 1 of seeds [0,1,2,3,42]). This is the machine-readable final step of
docs/RUNBOOK_EGRESS.md: exits 0 iff both metrics are within tolerance.

The tolerance default (1.0 point absolute) is the reference's own
cross-seed spread: the paper reports per-seed variation of this order, so
a port that lands within one point of the seed-1 number is reproducing the
recipe, not echoing the checksum.

Usage:
    python scripts/compare_rc_metrics.py path/to/metrics.json \
        [--expected-em 21.957] [--expected-f1 25.379] [--tol 1.0] \
        [--out comparison.json]
"""
from __future__ import annotations

import argparse
import json
import sys

REFERENCE = {  # experiments/rc/viquae/metrics.json (seed 1)
    "exact_match": 21.957040572792362,
    "f1": 25.378922779047297,
}

# keys as written by both the reference (test_exact_match/test_f1) and
# this repo's ReaderTrainee.test_protocol metrics.json (exact_match/f1)
KEY_ALIASES = {
    "exact_match": ("exact_match", "test_exact_match", "em", "EM"),
    "f1": ("f1", "test_f1", "F1"),
}


def extract(metrics: dict, name: str) -> float:
    for k in KEY_ALIASES[name]:
        if k in metrics:
            return float(metrics[k])
    raise KeyError(f"no {name} key in metrics ({sorted(metrics)})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics", help="metrics.json from `viquae_tpu train "
                                    "test configs/experiments/rc/viquae.yaml`")
    ap.add_argument("--expected-em", type=float,
                    default=REFERENCE["exact_match"])
    ap.add_argument("--expected-f1", type=float, default=REFERENCE["f1"])
    ap.add_argument("--tol", type=float, default=1.0,
                    help="absolute tolerance in points (default: the "
                         "reference's cross-seed spread)")
    ap.add_argument("--out", default=None,
                    help="write the comparison JSON here too")
    args = ap.parse_args()

    with open(args.metrics) as f:
        metrics = json.load(f)
    got_em = extract(metrics, "exact_match")
    got_f1 = extract(metrics, "f1")
    # percentages vs fractions: normalize a [0,1]-scale report
    if got_em <= 1.0 and args.expected_em > 1.5:
        got_em, got_f1 = got_em * 100.0, got_f1 * 100.0

    result = {
        "exact_match": {"got": got_em, "expected": args.expected_em,
                        "delta": got_em - args.expected_em},
        "f1": {"got": got_f1, "expected": args.expected_f1,
               "delta": got_f1 - args.expected_f1},
        "tol": args.tol,
        "pass": (abs(got_em - args.expected_em) <= args.tol
                 and abs(got_f1 - args.expected_f1) <= args.tol),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
