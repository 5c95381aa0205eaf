#!/usr/bin/env python
"""Train-log analysis (reference ``tools/analysis_tools/analyze_logs.py``):
plot curves / report timings from ``train.log.json`` files."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def load_json_log(path):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def cal_train_time(records):
    times = [r["time"] for r in records if r.get("mode") == "train" and "time" in r]
    if not times:
        print("no timing records")
        return
    times = np.array(times)
    print(
        f"slowest iter: {times.max():.4f}s, fastest: {times.min():.4f}s, "
        f"mean: {times.mean():.4f}s, std: {times.std():.4f}s"
    )


def plot_curve(records, keys, out=None, title=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for key in keys:
        xs, ys = [], []
        for i, r in enumerate(records):
            if key in r:
                xs.append(i)
                ys.append(r[key])
        plt.plot(xs, ys, label=key)
    plt.legend()
    if title:
        plt.title(title)
    if out:
        plt.savefig(out)
        print(f"saved {out}")
    else:
        plt.show()


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="task", required=True)
    pc = sub.add_parser("plot_curve")
    pc.add_argument("json_logs", nargs="+")
    pc.add_argument("--keys", nargs="+", default=["loss"])
    pc.add_argument("--out", default=None)
    pc.add_argument("--title", default=None)
    ct = sub.add_parser("cal_train_time")
    ct.add_argument("json_logs", nargs="+")
    args = p.parse_args()

    for path in args.json_logs:
        records = load_json_log(path)
        print(f"== {path}: {len(records)} records")
        if args.task == "cal_train_time":
            cal_train_time(records)
        else:
            plot_curve(records, args.keys, args.out, args.title)


if __name__ == "__main__":
    main()
