#!/usr/bin/env python
"""Map profiled kernel names to HLO fusion bodies (round-5).

reports/profile_step.json names the expensive kernels of the flagship
train step (e.g. multiply_add_fusion.389 at 5.1 ms/step) but not what
they compute. This compiles the SAME step (warm persistent cache — no
long device occupancy), dumps the optimized HLO, and prints each hot
fusion's computation body (root + operand chain + shapes) so the next
optimization targets named graph regions instead of guesses.

Writes reports/hlo_attr.json. Run: python scripts/hlo_attr.py
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xla_bench_cache")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    from scripts.profile_step import build_step

    step, state, images, args = build_step(batch=16)
    import jax

    lowered = jax.jit(step).lower(state, images, *args)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    with open("/tmp/train_step_optimized.hlo", "w") as f:
        f.write(hlo)
    print(f"optimized HLO: {len(hlo) / 1e6:.1f} MB "
          f"-> /tmp/train_step_optimized.hlo")

    prof = json.load(open(os.path.join(HERE, "reports/profile_step.json")))
    hot = [o["name"] for o in prof["top_device_ops_ms"]
           if not o["name"].startswith("jit_") and not o["name"].isdigit()]

    # HLO computations look like:  %fused_computation.N { ... }  and are
    # referenced from  %multiply_add_fusion.389 = ... fusion(...),
    # calls=%fused_computation.N
    body_of = {}   # computation name -> text
    for m in re.finditer(r"^(%[\w.\-]+) (?:\([^)]*\) -> [^{]+)?\{", hlo,
                         re.M):
        start = m.start()
        depth = 0
        for i in range(m.end() - 1, len(hlo)):
            if hlo[i] == "{":
                depth += 1
            elif hlo[i] == "}":
                depth -= 1
                if depth == 0:
                    body_of[m.group(1).lstrip("%")] = hlo[start:i + 1]
                    break

    out = {}
    per_step = {o["name"]: o["per_step_ms"] for o in prof["top_device_ops_ms"]}
    for name in hot:
        # find the instruction that produced this kernel name
        pat = re.compile(r"^\s*%?" + re.escape(name) + r"(?:\.clone)?\s*=.*$",
                         re.M)
        m = pat.search(hlo)
        if not m:
            out[name] = {"ms": per_step.get(name), "instr": None}
            continue
        instr = m.group(0).strip()
        entry = {"ms": per_step.get(name), "instr": instr[:600]}
        cm = re.search(r"calls=%?([\w.\-]+)", instr)
        if cm and cm.group(1) in body_of:
            body = body_of[cm.group(1)]
            ops = re.findall(r"= [\w\[\]<>{}x, .:]*?(\w+)\(", body)
            entry["body_ops"] = sorted(set(ops))
            entry["body_lines"] = body.count("\n")
            entry["body_head"] = body[:1500]
        out[name] = entry
        print(f"--- {name}  ({per_step.get(name)} ms/step)")
        print("   ", instr[:240])
        if "body_ops" in entry:
            print("    ops:", ",".join(entry["body_ops"]),
                  f"({entry['body_lines']} lines)")

    with open(os.path.join(HERE, "reports/hlo_attr.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote reports/hlo_attr.json")


if __name__ == "__main__":
    main()
