"""Quick mesh-path bench after wiring the Pallas tile traversal."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import bench


def main():
    mrays, dt, build_s, n_tris = bench.bench_mesh_bvh()
    print(f"mesh: {mrays:.3f} Mray/s, {dt*1e3:.2f} ms/frame, "
          f"build {build_s*1e3:.0f} ms, {n_tris} tris")


if __name__ == "__main__":
    main()
