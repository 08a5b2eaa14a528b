"""Regenerate the golden-field snapshots (tests/golden/fields.npz).

Run manually after an INTENDED trajectory change:

    cd tests && python generate_goldens.py

The committed snapshot is the frozen oracle; test_golden_fields.py asserts
1e-8-relative reproduction (BASELINE.md correctness row).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import golden_configs as gc

    out = gc.compute_all()
    path = os.path.join(os.path.dirname(__file__), "golden", "fields.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    for k, v in out.items():
        print(f"{k}: shape={v.shape} |max|={np.abs(v).max():.6e}")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
