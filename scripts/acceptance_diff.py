"""Acceptance diff: compare two reference-format Test{1,2}_results.txt files.

The real-data acceptance criterion (BASELINE.json north star) is
"lateral-error@1m recall within 0.5 pt of the PyTorch reference on the
KITTI cross-view test set, evaluating the released pretrained models".
Both this repo's eval (`--test 1`) and the reference's
(`/root/reference/train_kitti.py:82-161`) append the same human-readable
block per epoch; this script parses the LAST block of each file and
reports per-metric deltas, exiting nonzero when the criterion fails.

Usage:
    python scripts/acceptance_diff.py OURS.txt REFERENCE.txt \
        [--criterion lateral_1m] [--tol 0.5]

The criterion metric defaults to the north star (pred lateral recall @1m);
``--all-tol`` additionally applies the tolerance to every parsed recall.
"""

import argparse
import re
import sys

# one regex per results-file line family -> canonical metric names
_PATTERNS = [
    (r"distance within (\d+) meters \(pred, init\): ([\d.]+)",
     "distance_{}m"),
    (r"lateral\s+within (\d+) meters \(pred, init\): ([\d.]+)",
     "lateral_{}m"),
    (r"longitudinal within (\d+) meters \(pred, init\): ([\d.]+)",
     "longitudinal_{}m"),
    (r"angle within (\d+) degrees \(pred, init\): ([\d.]+)",
     "angle_{}deg"),
    (r"lat within (\d+) & angle within \d+ \(pred, init\): ([\d.]+)",
     "lat{}m_joint"),
]


def parse_last_block(path: str) -> dict:
    """Metric dict from the final EPOCH block of a results file."""
    text = open(path).read()
    blocks = text.split("       EPOCH:")
    if len(blocks) < 2:
        raise SystemExit(f"{path}: no EPOCH block found — is this a "
                         "Test{1,2}_results.txt?")
    last = blocks[-1]
    out = {}
    m = re.search(r"Time per image \(second\): ([\d.eE+-]+)", last)
    if m:
        out["time_per_image"] = float(m.group(1))
    for pat, name in _PATTERNS:
        for t, v in re.findall(pat, last):
            out[name.format(t)] = float(v)
    if not any(k.startswith("lateral") for k in out):
        raise SystemExit(f"{path}: no recall lines parsed from the last "
                         "block — format drift?")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("ours")
    ap.add_argument("reference")
    ap.add_argument("--criterion", default="lateral_1m",
                    help="metric the pass/fail gate applies to")
    ap.add_argument("--tol", type=float, default=0.5,
                    help="max |delta| in recall points (north star: 0.5)")
    ap.add_argument("--all-tol", action="store_true",
                    help="apply --tol to EVERY shared recall metric")
    args = ap.parse_args(argv)

    a = parse_last_block(args.ours)
    b = parse_last_block(args.reference)
    shared = [k for k in a if k in b and k != "time_per_image"]
    if args.criterion not in shared:
        raise SystemExit(f"criterion '{args.criterion}' missing from one "
                         f"side (have: {sorted(shared)})")

    width = max(len(k) for k in shared)
    failures = []
    for k in sorted(shared):
        d = a[k] - b[k]
        gate = (k == args.criterion) or args.all_tol
        bad = gate and abs(d) > args.tol
        mark = "FAIL" if bad else ("gate" if k == args.criterion else "")
        print(f"{k:<{width}}  ours {a[k]:7.2f}  ref {b[k]:7.2f}  "
              f"delta {d:+6.2f}  {mark}")
        if bad:
            failures.append(k)
    if "time_per_image" in a and "time_per_image" in b and b["time_per_image"]:
        print(f"{'time_per_image':<{width}}  ours {a['time_per_image']:.4f}s"
              f"  ref {b['time_per_image']:.4f}s  speedup "
              f"{b['time_per_image'] / a['time_per_image']:.1f}x")
    if failures:
        print(f"\nACCEPTANCE FAIL: {failures} exceed ±{args.tol} pt")
        return 1
    print(f"\nACCEPTANCE PASS: '{args.criterion}' within ±{args.tol} pt"
          + (" (all metrics gated)" if args.all_tol else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
