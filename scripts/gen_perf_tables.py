#!/usr/bin/env python
"""Regenerate the README/SERVING throughput tables from a bench JSON.

Single source of perf truth (VERDICT r4 item 8): every throughput number
in the docs' generated regions comes from one driver-captured bench run
(BENCH_rNN.json), so prose can never quote a stale or best-local number
again (r4 shipped 141.5 driver-truth as "145.0"/"~150" in three files).

Usage:
    python scripts/gen_perf_tables.py [path/to/BENCH_rNN.json]

With no argument, picks the highest-numbered BENCH_r*.json in the repo
root.  Accepts either the driver wrapper ({"parsed": {...}}) or the raw
one-line bench.py JSON.  Rewrites the regions between
``<!-- PERF_TABLE ... -->`` and ``<!-- /PERF_TABLE -->`` markers in
README.md and docs/SERVING.md in place, labeling them with the source
file name.  Missing keys render as an em dash — tables degrade, never
lie.
"""

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def load_detail(path: Path):
    data = json.loads(path.read_text())
    if "parsed" in data:
        data = data["parsed"]
    if "detail" not in data:
        raise SystemExit(f"{path}: no 'detail' field (not a bench JSON?)")
    return data["detail"], data


def latest_bench() -> Path:
    cands = sorted(ROOT.glob("BENCH_r*.json"))
    if not cands:
        raise SystemExit("no BENCH_r*.json in repo root")
    return cands[-1]


def fmt(detail, key, scale=1.0, nd=1):
    v = detail.get(key)
    if v is None:
        return "—"
    v = v * scale
    return f"{v:.{nd}f}" if nd else f"{v:.0f}"


def decode_table(detail):
    rows = [
        ("bf16 (packed)", "bf16"),
        ("**int8 weight-only (serving default)**", "int8"),
        ("int4 W4A8 (group scales, in-kernel int8 activations, int8 head)",
         "int4"),
    ]
    steadies = detail.get("decode_tps_b1_steady", {})
    lines = ["| mode | b=1 tok/s | b=1 steady tok/s | b=8 tok/s "
             "| b=1 tok/s @ 1984-token ctx |",
             "|---|---|---|---|---|"]
    for label, tag in rows:
        b1 = fmt(detail, f"decode_tps_{tag}_b1")
        sv = steadies.get(f"{tag} b=1")
        sd = "—" if sv is None else f"{sv:.1f}"
        b8 = fmt(detail, f"decode_tps_{tag}_b8", nd=0)
        lc = fmt(detail, f"decode_tps_{tag}_b1_ctx1984_kvint8")
        lc = lc if lc == "—" else f"{lc} (int8 KV)"
        lines.append(f"| {label} | {b1} | {sd} | {b8} | {lc} |")
    lines.append("")
    lines.append("(b=1 = whole 64-step generate calls, prefill included, "
                 "dispatched back to back; *steady* = marginal per-token "
                 "rate from the 128-vs-64-step single-call slope — what a "
                 "long generation pays per token.)")
    return "\n".join(lines)


def summary_lines(detail):
    out = []
    p = fmt(detail, "prefill_tps_int8_s1984", nd=0)
    if p != "—":
        out.append(f"Chunked prefill: {p} tok/s int8 at s=1984.")
    for tag in ("int8", "int4"):
        eo = fmt(detail, f"engine_mixed_tps_{tag}_b8")
        et = fmt(detail, f"engine_mixed_total_tps_{tag}_b8", nd=0)
        if eo != "—":
            tot = (f" ({et} tok/s total incl. prefilled prompt tokens)"
                   if et != "—" else "")
            out.append("Continuous-batching engine, b=8 mixed stream with "
                       f"contexts up to 1920, {tag} weights: {eo} output "
                       f"tok/s{tot}.")
    ts = fmt(detail, "train_qlora_s_per_step_b1_seq256", nd=3)
    tt = fmt(detail, "train_qlora_tokens_per_s_per_chip", nd=0)
    if ts != "—":
        out.append(f"6B QLoRA fine-tuning on ONE chip: {ts} s/step at b=1 "
                   f"seq=256 ({tt} train tok/s/chip).")
    t2s = fmt(detail, "train_qlora_s_per_step_b1_seq2048_ga2", nd=3)
    t2t = fmt(detail, "train_qlora_tokens_per_s_per_chip_seq2048", nd=0)
    if t2s != "—":
        out.append(f"Recipe-scale step (seq 2048, grad-accum 2): {t2s} "
                   f"s/step ({t2t} train tok/s/chip).")
    ce = fmt(detail, "caption_e2e_p50_s", nd=2)
    if ce != "—":
        out.append(f"Single-image caption (149-token prompt, 64 greedy "
                   f"steps) end-to-end p50: {ce} s including on-device "
                   "preprocessing + RN50x16 encode.")
    return "\n".join(out)


def render(detail, src_name):
    return (f"_Measured numbers below are generated from `{src_name}` by "
            "`scripts/gen_perf_tables.py`; do not hand-edit._\n\n"
            + decode_table(detail) + "\n\n" + summary_lines(detail))


MARK = re.compile(
    r"(<!-- PERF_TABLE.*?-->).*?(<!-- /PERF_TABLE -->)", re.S)


def rewrite(path: Path, block: str) -> bool:
    text = path.read_text()
    new, n = MARK.subn(
        lambda m: m.group(1) + "\n" + block + "\n" + m.group(2), text)
    if n == 0:
        print(f"  {path.relative_to(ROOT)}: no PERF_TABLE markers, skipped")
        return False
    path.write_text(new)
    print(f"  {path.relative_to(ROOT)}: regenerated {n} region(s)")
    return True


def main():
    src = Path(sys.argv[1]) if len(sys.argv) > 1 else latest_bench()
    detail, _ = load_detail(src)
    block = render(detail, src.name)
    print(f"from {src.name}:")
    for f in (ROOT / "README.md", ROOT / "docs" / "SERVING.md"):
        rewrite(f, block)


if __name__ == "__main__":
    main()
