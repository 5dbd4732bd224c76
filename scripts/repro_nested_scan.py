"""Minimal repro for the Pallas + nested-scan TPU fault (commit fe957ee).

Symptom: in make_cadenced_chunk_step, nesting the per-group loop as an OUTER
lax.scan around the inner track-step lax.scan faults the TPU runtime when the
step body contains the Pallas patch-extraction kernel. Python-unrolling the
outer loop (the shipped workaround, pipeline/frontend.py) runs fine, as does
either loop alone.

This script isolates the smallest program with the same structure:

    variant "unrolled":   python for-loop  { kernel; lax.scan { kernel } }
    variant "nested":     lax.scan        { kernel; lax.scan { kernel } }
    variant "nested_xla": same as nested, with the Pallas kernel swapped for
                          the XLA dynamic_slice path (isolates Pallas)
    variant "nested_nokf": outer scan whose body is ONLY the inner scan
                          (isolates the kernel-before-scan sequencing)

Each variant runs in a fresh subprocess (a runtime fault kills the process);
the parent reports pass/fail per variant.

    python scripts/repro_nested_scan.py          # run all variants
    python scripts/repro_nested_scan.py nested   # run one in-process
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

VARIANTS = ("unrolled", "nested", "nested_xla", "nested_nokf")


def build(variant: str):
    import jax
    import jax.numpy as jnp

    from svo_tpu.ops.klt import _corners, _extract_patches_xla
    from svo_tpu.ops.klt_pallas import extract_klt_patches

    H, W, N, PY, PX = 200, 384, 64, 40, 64
    GROUPS, INNER = 2, 5

    def extract(img, pos, use_pallas: bool):
        ty0, tx0, cy0, cx0 = _corners(
            pos, jnp.zeros_like(pos), H, W, PY, PX, 21, 6
        )
        if use_pallas:
            t, gx, gy, c = extract_klt_patches(
                img, img, img, img, ty0, tx0, cy0, cx0,
                jnp.ones((N,), bool), py=PY, px=PX,
            )
        else:
            tc = jnp.stack([ty0, tx0], -1)
            t = _extract_patches_xla(img, tc, PY, PX)
            c = t
        return t.mean(axis=(1, 2))

    use_pallas = variant != "nested_xla"

    def step(carry, img):
        pos, acc = carry
        m = extract(img, pos, use_pallas)
        pos = pos + 0.01 * m[:, None]
        return (pos, acc + m.sum()), None

    @jax.jit
    def run(pos0, imgs):
        # imgs: (GROUPS, 1+INNER, H, W)
        carry = (pos0, jnp.float32(0))

        def group_body(c, group_imgs):
            if variant != "nested_nokf":
                c, _ = step(c, group_imgs[0])      # the "keyframe" step
            c, _ = jax.lax.scan(step, c, group_imgs[1:])  # track steps
            return c, None

        if variant == "unrolled":
            for g in range(GROUPS):
                carry, _ = group_body(carry, imgs[g])
        else:
            carry, _ = jax.lax.scan(group_body, carry, imgs)
        return carry

    import numpy as np

    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.uniform(30, 150, (N, 2)).astype(np.float32))
    imgs = jnp.asarray(
        rng.uniform(0, 255, (GROUPS, 1 + INNER, H, W)).astype(np.float32)
    )
    return run, pos0, imgs


def main_variant(variant: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    run, pos0, imgs = build(variant)
    out = jax.block_until_ready(run(pos0, imgs))
    print(f"{variant}: OK acc={float(out[1]):.3f}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        main_variant(sys.argv[1])
        sys.exit(0)
    results = {}
    for v in VARIANTS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), v],
            capture_output=True, text=True, timeout=600,
        )
        ok = p.returncode == 0
        results[v] = "OK" if ok else f"FAULT (rc={p.returncode})"
        print(f"--- {v}: {results[v]}")
        if not ok:
            tail = (p.stderr or p.stdout).strip().splitlines()[-12:]
            print("\n".join(tail))
    print(results)
