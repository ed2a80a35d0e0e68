#!/usr/bin/env python3
"""Assemble STRESS_x{Kmax}.json from ScaleStress run logs (any set of Ks).

Usage: tools/stress_report.py /tmp/stress_x1.log /tmp/stress_x10.log [more...]
Each log is one `runMain graft.tools.ScaleStress K` capture; K is read from
the JSON phase lines themselves. Per-query scaling exponents compare the
smallest K to the largest: exponent = log(t_max/t_min) / log(Kmax/Kmin),
so 1.0 = linear in |data| regardless of the K range.
"""
import json, math, re, sys


def parse(path):
    out = {"queries": {}}
    for line in open(path, errors="replace"):
        m = re.search(r'\{"stress_(phase|statements|summary)[^\n]*\}', line)
        if not m:
            continue
        d = json.loads(m.group(0))
        if "k" in d:
            out["k"] = d["k"]
        if "stress_statements" in d:
            out["statements"] = d["stress_statements"]
        elif d.get("stress_phase") == "cold_load":
            out["load_sec"] = d["sec"]
        elif d.get("stress_phase", "").startswith("q:"):
            out["queries"][d["stress_phase"][2:]] = d["sec"]
    return out


def main():
    if len(sys.argv) < 3:
        sys.exit("usage: stress_report.py <log_k1> <log_k2> [more...] (need >= 2 runs)")
    runs = [parse(p) for p in sys.argv[1:]]
    for p, r in zip(sys.argv[1:], runs):
        if "k" not in r:
            sys.exit(f"{p}: no stress phase line with a 'k' field — not a ScaleStress log?")
    runs.sort(key=lambda r: r["k"])
    ks = [r["k"] for r in runs]
    if len(set(ks)) < 2:
        sys.exit(f"all logs share K={ks[0]} — need at least two distinct Ks for an exponent")
    lo, hi = runs[0], runs[-1]
    span = math.log10(hi["k"] / lo["k"])
    exp_name = f'exponent_{lo["k"]}_to_{hi["k"]}'

    def expo(t_lo, t_hi):
        return round(math.log10(max(t_hi, 0.01) / max(t_lo, 0.01)) / span, 2)

    res = {
        "harness": ("graft.tools.ScaleStress: sf0.1 amplified Kx with FK-consistent key "
                    "offsets, COLD store build per K, query battery via SparkEntry.queries, "
                    "local[32], 64g driver heap"),
        "note": (f"x{lo['k']} re-run through the same harness/config on the same machine "
                 f"so exponents are apples-to-apples; exponent = "
                 f"log(t_x{hi['k']}/t_x{lo['k']}) / log({hi['k']}/{lo['k']}), "
                 "1.0 = linear in |data|"),
        "statements": {f"x{r['k']}": r.get("statements") for r in runs},
        "load_sec": {f"x{r['k']}": r.get("load_sec") for r in runs},
        f"load_{exp_name}": expo(lo["load_sec"], hi["load_sec"]),
        "queries": {},
    }
    for q, t_lo in lo["queries"].items():
        if any(q not in r["queries"] for r in runs):
            continue
        entry = {f"x{r['k']}": r["queries"][q] for r in runs}
        entry[exp_name] = expo(t_lo, hi["queries"][q])
        res["queries"][q] = entry
    out_path = f"STRESS_x{hi['k']}.json"
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(out_path, json.dumps(res["load_sec"]), res[f"load_{exp_name}"])
    for q, d in sorted(res["queries"].items(), key=lambda kv: -kv[1][exp_name]):
        cols = " ".join(f'x{k}={d[f"x{k}"]:6.2f}' for k in ks)
        print(f"{q:22s} {cols} exp={d[exp_name]}")


if __name__ == "__main__":
    main()
