#!/usr/bin/env python
"""Aggregate results across seed directories by scraping log files.

Behavior parity with the reference tool (PromptSRC/parse_test_res.py:64-174):
walks ``<directory>/seed*/log.txt``, waits for the end-signal line
("Finished training" or "=> result"), scrapes ``* <metric>: <value>%`` lines,
and reports mean (+ std or 95% CI) per metric.  ``--multi-exp`` aggregates
one level higher (each subdirectory is an experiment containing seed dirs).

Usage:
    python parse_test_res.py output/caltech101/CoOp/...   # dir with seed1..N
    python parse_test_res.py output/caltech101 --multi-exp
    python parse_test_res.py ... --ci95
"""

import argparse
import os
import re
from collections import defaultdict

import numpy as np

END_SIGNALS = ("Finished training", "=> result")
METRIC_RE = re.compile(r"\* (?P<name>[a-zA-Z0-9_]+): (?P<value>[\.\deE+-]+)%")


def parse_dir(directory, end_signal_required=True):
    """Parse every seed*/log.txt* under directory -> {metric: [values]}."""
    metrics = defaultdict(list)
    subdirs = sorted(
        d for d in os.listdir(directory)
        if os.path.isdir(os.path.join(directory, d)) and d.startswith("seed")
    )
    if not subdirs:
        subdirs = ["."]

    for sub in subdirs:
        logs = [
            f
            for f in os.listdir(os.path.join(directory, sub))
            if f.startswith("log.txt")
        ]
        if not logs:
            print(f"warning: no log file under {os.path.join(directory, sub)}")
            continue
        logs.sort(key=lambda f: os.path.getmtime(os.path.join(directory, sub, f)))
        fpath = os.path.join(directory, sub, logs[-1])

        reached_end = not end_signal_required
        seed_metrics = {}
        with open(fpath, errors="replace") as f:
            for line in f:
                if any(sig in line for sig in END_SIGNALS):
                    reached_end = True
                if reached_end:
                    m = METRIC_RE.search(line)
                    if m:
                        seed_metrics[m.group("name")] = float(m.group("value"))
        if not reached_end:
            print(f"warning: end-signal not found in {fpath} (run incomplete?)")
        for k, v in seed_metrics.items():
            metrics[k].append(v)
    return metrics


def summarize(metrics, ci95=False, prefix=""):
    out = {}
    for name, values in metrics.items():
        arr = np.asarray(values, np.float64)
        mean = arr.mean()
        if ci95:
            spread = 1.96 * arr.std(ddof=0) / np.sqrt(max(len(arr), 1))
            tag = "+- (95% CI)"
        else:
            spread = arr.std(ddof=0)
            tag = "+-"
        print(f"{prefix}* {name}: {mean:.2f}% {tag} {spread:.2f}%  (n={len(arr)})")
        out[name] = mean
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("directory", help="path to the experiment directory")
    parser.add_argument("--ci95", action="store_true", help="report 95% CI instead of std")
    parser.add_argument("--multi-exp", action="store_true",
                        help="directory contains multiple experiments, each with seed dirs")
    parser.add_argument("--keyword", default="accuracy", help="metric for the final average")
    parser.add_argument("--test-log", action="store_true",
                        help="accepted for reference-CLI compatibility; both "
                        "'Finished training' and '=> result' end signals are "
                        "always recognized here")
    args = parser.parse_args()

    if args.multi_exp:
        final = defaultdict(list)
        for exp in sorted(os.listdir(args.directory)):
            exp_dir = os.path.join(args.directory, exp)
            if not os.path.isdir(exp_dir):
                continue
            print(f"=== {exp} ===")
            means = summarize(parse_dir(exp_dir), ci95=args.ci95, prefix="  ")
            for k, v in means.items():
                final[k].append(v)
        print("=== overall average ===")
        # --keyword selects the metric for the final cross-experiment average
        # (reference parse_test_res.py keys its main_results on it); fall
        # back to everything when the keyword was never scraped.
        picked = {k: v for k, v in final.items() if k == args.keyword}
        summarize(picked or dict(final), ci95=args.ci95)
    else:
        print(f"Parsing files in {args.directory}")
        summarize(parse_dir(args.directory), ci95=args.ci95)


if __name__ == "__main__":
    main()
