"""Generate the committed golden-image fixtures for tests/test_golden.py.

Run on CPU (deterministic jnp path):
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
      python tools/gen_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from tests.test_golden import CASES, GOLDEN_DIR, _cfg, render

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    force = "--force" in sys.argv
    for name, case in sorted(CASES.items()):
        path = os.path.join(GOLDEN_DIR, f"{name}.npy")
        if os.path.exists(path) and not force:
            print(f"{name}: exists, skipping (use --force to regenerate)")
            continue
        req = case.get("requires")
        if req and not os.path.exists(req):
            print(f"{name}: reference asset missing ({req}), skipping")
            continue
        scene, meta, _ = case["scene"]()
        img = render(scene, meta, _cfg(), case["eye"])
        np.save(path, img.astype(np.float32))
        print(f"{name}: {img.shape} mean={img.mean(axis=(0, 1))} -> {path}")


if __name__ == "__main__":
    main()
