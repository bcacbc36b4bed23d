#!/usr/bin/env python3
"""Summarize SCALEPROBE output lines into a markdown scaling table.

Reads a log containing `SCALEPROBE {json}` lines (graft.ScaleProbe),
fits the observed scaling exponent b in t = a * mult^b by least squares
over log(mult), and prints the STATUS-ready table. Scale labels must be
x<mult> (x1, x3, x10).
"""
import json
import math
import re
import sys


def main():
    rows = {}
    for line in open(sys.argv[1]):
        m = re.search(r"SCALEPROBE (\{.*\})", line)
        if not m:
            continue
        d = json.loads(m.group(1))
        rows.setdefault(d["probe"], {})[int(d["scale"][1:])] = d["min"]
    print("| probe | " + " | ".join(
        f"x{m}" for m in sorted({m for v in rows.values() for m in v})) +
        " | exponent |")
    print("|---|" + "---|" * (1 + len({m for v in rows.values() for m in v})))
    for probe, by_mult in rows.items():
        mults = sorted(by_mult)
        xs = [math.log(m) for m in mults]
        ys = [math.log(by_mult[m]) for m in mults]
        n = len(xs)
        if n > 1:
            xbar, ybar = sum(xs) / n, sum(ys) / n
            b = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / \
                sum((x - xbar) ** 2 for x in xs)
            exp = f"{b:.2f}"
        else:
            exp = "n/a"
        cells = " | ".join(
            f"{by_mult[m]:.2f}s" if m in by_mult else "—"
            for m in sorted({m for v in rows.values() for m in v}))
        print(f"| {probe} | {cells} | {exp} |")


if __name__ == "__main__":
    main()
