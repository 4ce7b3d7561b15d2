"""Chip timing of the halo operator's LOCAL apply vs the single-device
linear operator (VERDICT r4 next-4 'done' criterion).

The halo operator (ops/psf_operator.make_halo_operator) applies a local
rFFT valid-convolution to the halo-extended tile — same semantics as the
padded-rFFT linear operator, plus the ppermute halo exchange. On one
device the exchange degenerates to zero-halos (axis size 1), so timing it
on a 1x1 mesh isolates the local-apply cost; the criterion is local apply
within ~2x of the linear operator at the same tile size.

Each timed program CHAINS the A+AT apply ``chain`` times inside one jit
(a lax.fori_loop), so the per-apply cost is read above the rig's ~40 ms
per-program dispatch floor instead of being buried under it.

Usage: python examples/time_halo_operator.py [tile_h] [repeats] [chain]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _min_wall(fn, repeats):
    fn()
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return min(walls)


def main():
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 410
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    chain = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    import tpu_sgp  # noqa: F401  (enables the persistent compile cache)
    from tpu_sgp.ops.psf_operator import (make_halo_operator,
                                          make_linear_operator)
    from tpu_sgp.simulate import gaussian_psf

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(10, 1000, (tile, tile)), jnp.float32)
    psf = jnp.asarray(gaussian_psf(31, fwhm=3.0), jnp.float32)

    def chained(apply):
        # AT(A(x)) with a unit-sum PSF preserves the image sum, so the
        # chain stays numerically bounded without rescaling
        def run(x):
            return jax.lax.fori_loop(0, chain, lambda _, v: apply(v), x)
        return run

    # -- linear operator (single-device reference) -------------------------
    A_lin, AT_lin = make_linear_operator(psf, (tile, tile))
    lin1 = jax.jit(lambda x: AT_lin(A_lin(x)))
    lin = jax.jit(chained(lambda x: AT_lin(A_lin(x))))
    img_d = jax.device_put(img)
    w_lin = _min_wall(lambda: np.asarray(lin(img_d)), repeats)

    # -- halo operator local apply on a 1x1 mesh ---------------------------
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ('ty', 'tx'))
    A_h, AT_h = make_halo_operator(psf, ('ty', 'tx'))
    halo1 = jax.jit(shard_map(lambda x: AT_h(A_h(x)), mesh=mesh,
                              in_specs=P('ty', 'tx'),
                              out_specs=P('ty', 'tx')))
    halo = jax.jit(shard_map(chained(lambda x: AT_h(A_h(x))), mesh=mesh,
                             in_specs=P('ty', 'tx'),
                             out_specs=P('ty', 'tx')))
    img_s = jax.device_put(img, NamedSharding(mesh, P('ty', 'tx')))
    w_halo = _min_wall(lambda: np.asarray(halo(img_s)), repeats)

    # -- agreement check (single apply) -------------------------------------
    a = np.asarray(lin1(img_d))
    b = np.asarray(halo1(img_s))
    rel = float(np.abs(a - b).max() / np.abs(a).max())

    print(f'tile={tile} repeats={repeats} chain={chain}')
    print(f'linear A+AT: {w_lin * 1e3 / chain:.3f} ms/apply '
          f'(min wall {w_lin * 1e3:.1f} ms / {chain})')
    print(f'halo   A+AT: {w_halo * 1e3 / chain:.3f} ms/apply '
          f'(min wall {w_halo * 1e3:.1f} ms / {chain})  '
          f'ratio={w_halo / w_lin:.2f}x')
    print(f'max rel diff (single apply): {rel:.2e}')


if __name__ == '__main__':
    main()
