"""Rank compiled-HLO entry instructions by HBM bytes (output + operands).

Parses compiled.as_text() of a jitted function: for each instruction in the
ENTRY computation, bytes = output shape bytes + sum of operand shape bytes
(operands that are other entry instructions' outputs; matches how XLA's
cost analysis charges post-fusion HBM traffic). Groups by instruction kind
and prints the top consumers — the "where do the 70 GB go" tool.
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8,
}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(s: str) -> int:
    """Bytes of one shape token 'bf16[196608,128]{1,0}' or tuple '(a, b)'."""
    total = 0
    for m in SHAPE_RE.finditer(s):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*"      # instruction name
    r"(\(.*?\)|\S+)\s+"                         # output shape (tuple or one token)
    r"([a-z][\w\-]*)\((.*)$"                    # op kind + operands
)


def analyze(hlo: str, top: int = 30):
    lines = hlo.splitlines()
    # find ENTRY computation
    start = None
    for i, l in enumerate(lines):
        if l.startswith("ENTRY "):
            start = i
            break
    assert start is not None, "no ENTRY computation"
    depth = 0
    entry_lines = []
    for l in lines[start:]:
        depth += l.count("{") - l.count("}")
        entry_lines.append(l)
        if depth == 0 and len(entry_lines) > 1:
            break

    # map instruction name -> output bytes
    out_bytes = {}
    rows = []
    for l in entry_lines:
        m = INSTR_RE.match(l)
        if not m:
            continue
        name, shape_s, op, rest = m.groups()
        ob = shape_bytes(shape_s)
        out_bytes[name] = ob
        rows.append((name, op, ob, rest, l))

    ranked = []
    by_kind = defaultdict(lambda: [0, 0])
    for name, op, ob, rest, l in rows:
        # operand bytes: referenced %names that are entry instructions
        ref = re.findall(r"%([\w.\-]+)", rest)
        ib = sum(out_bytes.get(r, 0) for r in set(ref))
        total = ob + ib
        # classify fusions by their metadata op_name if present
        label = op
        mm = re.search(r'op_name="([^"]+)"', l)
        if mm:
            label = f"{op}:{mm.group(1).split('/')[-1][:60]}"
        kind_m = re.search(r"kind=(\w+)", l)
        if op == "fusion" and kind_m:
            label = f"fusion[{kind_m.group(1)}]:{(mm.group(1) if mm else name)[-70:]}"
        ranked.append((total, ob, ib, name, label))
        by_kind[op][0] += total
        by_kind[op][1] += 1

    ranked.sort(reverse=True)
    grand = sum(t for t, *_ in ranked)
    print(f"total entry bytes (out+in): {grand/1e9:.2f} GB over {len(ranked)} instrs")
    print("\n-- by op kind --")
    for k, (b, c) in sorted(by_kind.items(), key=lambda kv: -kv[1][0])[:15]:
        print(f"  {k:24s} {b/1e9:8.2f} GB  ({c} instrs)")
    print(f"\n-- top {top} instructions --")
    for total, ob, ib, name, label in ranked[:top]:
        print(f"  {total/1e6:9.1f} MB (out {ob/1e6:8.1f}, in {ib/1e6:8.1f})  {name:28s} {label}")


if __name__ == "__main__":
    path = sys.argv[1]
    analyze(open(path).read(), top=int(sys.argv[2]) if len(sys.argv) > 2 else 30)
