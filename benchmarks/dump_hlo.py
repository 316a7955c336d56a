"""Dump the optimized HLO of the e2e grad program; print the hot fusions."""

import re
import sys

import jax
import jax.numpy as jnp


def main():
    from profile_e2e import build

    fn, args = build()
    compiled = fn.lower(*args).compile()
    text = compiled.as_text()
    with open("/tmp/e2e_hlo.txt", "w") as f:
        f.write(text)
    print(f"HLO dumped: {len(text)} chars", flush=True)
    for pat in (r"%fusion\.5 ", r"%fusion\.6 ", r"%fusion\.86 ",
                r"%fusion\.4 ", r"131072,1,1"):
        hits = [ln for ln in text.splitlines() if re.search(pat, ln)]
        print(f"--- {pat}: {len(hits)} lines")
        for ln in hits[:6]:
            print("   ", ln[:220])


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/benchmarks")
    main()
