"""Bench regression gate: per-query delta table between two bench JSONs
(VERDICT.md r1 item 10 — "did this round make it faster / which queries
regressed").

Usage: python tools/bench_compare.py OLD.json NEW.json [--update-md]
Prints a markdown table; --update-md rewrites the block between
``<!-- bench-delta:begin -->`` / ``<!-- bench-delta:end -->`` markers in
BENCH/BASELINE.md (appends the block if missing).

Reading the deltas: the host is shared (±2x run-to-run noise on small
queries — see BENCH/BASELINE.md) so single-digit-percent moves are
noise; flag only >30% regressions on queries longer than ~5s.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!-- bench-delta:begin -->", "<!-- bench-delta:end -->"


def delta_table(old: dict, new: dict, old_name: str, new_name: str) -> str:
    lines = [
        f"| query | {old_name} (s) | {new_name} (s) | delta |",
        "|---|---|---|---|",
    ]
    oq, nq = old.get("queries", {}), new.get("queries", {})
    for q in sorted(set(oq) | set(nq)):
        a, b = oq.get(q), nq.get(q)
        if a is None or b is None:
            d = "added" if a is None else "removed"
            lines.append(f"| {q} | {a if a is not None else '—'} | "
                         f"{b if b is not None else '—'} | {d} |")
            continue
        pct = (b - a) / a * 100 if a else 0.0
        lines.append(f"| {q} | {a:.2f} | {b:.2f} | {pct:+.0f}% |")
    a, b = old.get("value"), new.get("value")
    if a and b:
        lines.append(f"| **total** | **{a:.1f}** | **{b:.1f}** | **{(b-a)/a*100:+.0f}%** |")
    return "\n".join(lines)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    update = "--update-md" in sys.argv
    old_p, new_p = args[0], args[1]
    def load(p):
        with open(p) as f:
            d = json.load(f)
        # driver BENCH_r{N}.json wraps the bench line under "parsed"
        return d.get("parsed", d) if isinstance(d.get("parsed"), dict) else d

    old, new = load(old_p), load(new_p)
    name = lambda p: os.path.splitext(os.path.basename(p))[0]  # noqa: E731
    table = delta_table(old, new, name(old_p), name(new_p))
    print(table)
    if update:
        md = os.path.join(REPO, "BENCH", "BASELINE.md")
        with open(md) as f:
            text = f.read()
        block = f"{BEGIN}\n### Per-query delta: {name(old_p)} -> {name(new_p)}\n\n{table}\n{END}"
        if BEGIN in text:
            pre = text[: text.index(BEGIN)]
            post = text[text.index(END) + len(END):]
            text = pre + block + post
        else:
            text = text.rstrip() + "\n\n" + block + "\n"
        with open(md, "w") as f:
            f.write(text)
        print(f"\nupdated {md}")


if __name__ == "__main__":
    main()
