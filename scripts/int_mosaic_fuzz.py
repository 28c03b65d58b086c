"""On-chip mini-fuzz of the integer kernels' ragged/odd geometries —
interpret-mode padding and Mosaic overhang masking must agree."""
import sys
import numpy as np
sys.path.insert(0, ".")

def main():
    import jax.numpy as jnp
    from recfilter_tpu.kernels import int_scan

    rng = np.random.default_rng(0)
    cases = [
        ((5, 1000), [(1, 1, True)], 1),            # tiny rows, odd E
        ((13, 4096), [(2, -1, False)], 1),         # ragged rows
        ((200, 4097), [(1, 1, True), (1, -1, True)], 1),   # odd E chain
        ((4099, 77), [(3, 1, False)], 0),          # ragged lanes sublane
        ((8191, 130), [(1, -1, True)], 0),         # segmented sublane odd
        ((3, 131072), [(1, 1, True)], 1),          # segmented lane, few rows
        ((2, 5, 70001), [(2, 1, True)], 2),        # 3-D segmented lane
        ((6, 8193, 128), [(1, 1, False)], 1),      # 3-D segmented sublane
    ]
    for shape, units, axis in cases:
        x = rng.integers(-1000, 1000, shape).astype(np.int32)
        got = int_scan.int_unit_dim_pass(jnp.asarray(x), units, axis, False)
        assert got is not None, (shape, axis)
        v = x.astype(np.int64)
        for f, sgn, causal in units:
            y = np.zeros_like(v)
            E = v.shape[axis]
            idx = range(E) if causal else range(E - 1, -1, -1)
            prev = np.zeros(np.delete(v.shape, axis), np.int64)
            for i in idx:
                sl = [slice(None)] * v.ndim
                sl[axis] = i
                cur = f * v[tuple(sl)] + sgn * prev
                y[tuple(sl)] = cur
                prev = cur
            v = y
        ok = np.array_equal(np.asarray(got).astype(np.int64) & 0xFFFFFFFF,
                            v & 0xFFFFFFFF)
        print(shape, "axis", axis, "EXACT" if ok else "MISMATCH", flush=True)
        assert ok

    print("all exact", flush=True)

if __name__ == "__main__":
    main()
