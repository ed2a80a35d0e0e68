#!/usr/bin/env python3
"""Assemble STRESS_x10.json from ScaleStress run logs.

Usage: tools/stress_report.py /tmp/stress_x1.log /tmp/stress_x2.log /tmp/stress_x10.log
Reads the one-line-JSON phases each log prints, computes per-query scaling
exponents (log10 of the x10/x1 ratio), writes STRESS_x10.json.
"""
import json, math, re, sys


def parse(path):
    out = {"queries": {}}
    for line in open(path, errors="replace"):
        m = re.search(r'\{"stress_(phase|statements|summary)[^\n]*\}', line)
        if not m:
            continue
        d = json.loads(m.group(0))
        if "stress_statements" in d:
            out["statements"] = d["stress_statements"]
        elif d.get("stress_phase") == "cold_load":
            out["load_sec"] = d["sec"]
        elif d.get("stress_phase", "").startswith("q:"):
            out["queries"][d["stress_phase"][2:]] = d["sec"]
    return out


def main():
    logs = {1: parse(sys.argv[1]), 2: parse(sys.argv[2]), 10: parse(sys.argv[3])}
    res = {
        "harness": ("graft.tools.ScaleStress: sf0.1 amplified Kx with FK-consistent key "
                    "offsets, COLD store build per K, query battery via SparkEntry.queries, "
                    "local[32], 64g driver heap"),
        "note": ("x1 re-run through the same harness/config so exponents are "
                 "apples-to-apples; exponent = log10(t_x10 / t_x1), 1.0 = linear in |data|"),
        "statements": {f"x{k}": logs[k].get("statements") for k in (1, 2, 10)},
        "load_sec": {f"x{k}": logs[k].get("load_sec") for k in (1, 2, 10)},
        "load_exponent_1_to_10": round(
            math.log10(logs[10]["load_sec"] / logs[1]["load_sec"]), 2),
        "queries": {},
    }
    for q, t1 in logs[1]["queries"].items():
        t2, t10 = logs[2]["queries"].get(q), logs[10]["queries"].get(q)
        if t2 is None or t10 is None:
            continue
        res["queries"][q] = {
            "x1": t1, "x2": t2, "x10": t10,
            "exponent_1_to_10": round(math.log10(max(t10, 0.01) / max(t1, 0.01)), 2),
        }
    with open("STRESS_x10.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res["load_sec"]), res["load_exponent_1_to_10"])
    for q, d in sorted(res["queries"].items(), key=lambda kv: -kv[1]["exponent_1_to_10"]):
        print(f'{q:22s} x1={d["x1"]:6.2f} x2={d["x2"]:6.2f} x10={d["x10"]:6.2f} exp={d["exponent_1_to_10"]}')


if __name__ == "__main__":
    main()
