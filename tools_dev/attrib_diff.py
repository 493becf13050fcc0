"""Dev probe: diff two quant_attrib capture dirs per-HLO-op.

    python tools_dev/attrib_diff.py /tmp/adas_qattrib_w2coff /tmp/adas_qattrib_w2c
"""
import sys

sys.path.insert(0, "tools_dev")
from quant_attrib import bucket, rows_from_trace  # noqa: E402


def load(outdir):
    rows = rows_from_trace(outdir)
    per = {}
    for r in rows:
        t = r.get("total_self_time") or 0.0
        if t <= 0:
            continue
        key = (bucket(r), r.get("hlo_op_name") or "?")
        e = per.setdefault(
            key, {"t": 0.0, "cat": r.get("category"),
                  "bb": r.get("bound_by"),
                  "expr": (r.get("hlo_op_expression") or "")[:140]}
        )
        e["t"] += t
    return per


def main():
    a = load(sys.argv[1])  # baseline (off)
    b = load(sys.argv[2])  # on
    # ops can be renamed/renumbered between graphs; match on bucket
    # totals first, then list the biggest unmatched ops on each side
    for bk in ("other", "elementwise", "layout", "conv"):
        ta = sum(v["t"] for (x, _), v in a.items() if x == bk)
        tb = sum(v["t"] for (x, _), v in b.items() if x == bk)
        print(f"bucket {bk:12s} off={ta:9.1f}  on={tb:9.1f}  "
              f"delta={tb - ta:+9.1f}")
    print("\n=== top 'other'+'layout' ops, OFF ===")
    for (bk, nm), v in sorted(
        a.items(), key=lambda kv: -kv[1]["t"]
    )[:40]:
        if bk in ("other", "layout"):
            print(f"  {v['t']:9.1f} {bk:6s} {v['cat']:<22} "
                  f"{v['bb']:<12} {nm}")
    print("\n=== top 'other'+'layout' ops, ON ===")
    for (bk, nm), v in sorted(
        b.items(), key=lambda kv: -kv[1]["t"]
    )[:40]:
        if bk in ("other", "layout"):
            print(f"  {v['t']:9.1f} {bk:6s} {v['cat']:<22} "
                  f"{v['bb']:<12} {nm}")


if __name__ == "__main__":
    main()
