"""Direct tests for public-API surfaces only exercised indirectly before.

Each function here is part of the reference-parity surface (cited in the
individual tests) or of the library's supported API; these pins make sure
the thin entry points behave — the heavy numerical cores behind them have
their own differential suites.
"""
import numpy as np
import pytest


# ---------------------------------------------------------------- simulate

def test_degrade_is_normalized_same_convolution():
    # reference utils.py:46-56: blur by the (normalized) PSF, 'same' size
    from tpu_sgp.simulate import degrade

    rng = np.random.default_rng(0)
    img = rng.uniform(1.0, 2.0, (16, 16))
    psf = np.zeros((5, 5))
    psf[2, 2] = 2.0  # unnormalized delta: degrade must normalize to sum 1
    out = degrade(img, psf)
    assert out.shape == img.shape
    np.testing.assert_allclose(out, img, rtol=1e-12)
    # flat image stays flat under any normalized kernel (interior pixels)
    g = np.exp(-((np.arange(5) - 2) ** 2) / 2.0)
    psf2 = np.outer(g, g)
    out2 = degrade(np.full((16, 16), 3.0), psf2)
    np.testing.assert_allclose(out2[4:-4, 4:-4], 3.0, rtol=1e-12)


def test_artificial_sky_background_seeding(monkeypatch):
    # reference utils.py:400-431: Poisson sky, GUIDE_RANDOM_SEED env seed
    from tpu_sgp.simulate import artificial_sky_background

    img = np.zeros((64, 64))
    a = artificial_sky_background(img, 200.0, seed=7)
    b = artificial_sky_background(img, 200.0, seed=7)
    np.testing.assert_array_equal(a, b)
    assert abs(a.mean() - 200.0) < 5.0
    monkeypatch.setenv('GUIDE_RANDOM_SEED', '7')
    c = artificial_sky_background(img, 200.0)
    np.testing.assert_array_equal(a, c)
    # gain scales the Poisson counts, not the returned sky level
    d = artificial_sky_background(img, 200.0, gain=4.0, seed=1)
    assert abs(d.mean() - 200.0) < 5.0
    assert d.var() < a.var()  # 4x the counts -> 1/4 the variance in ADU


# ----------------------------------------------------------------- metrics

def test_flux_fractional_difference():
    # application_sgp_star_stamps.py:131: 1 - restored/original
    from tpu_sgp.metrics import flux_fractional_difference

    assert flux_fractional_difference(90.0, 100.0) == pytest.approx(0.1)
    assert flux_fractional_difference(100.0, 100.0) == 0.0


# -------------------------------------------------------------- divergence

def test_beta_div_value_dispatch():
    # reference betaDiv special cases beta=0/1 (sgp.py:452-458); the
    # generic branch must approach them continuously
    from tpu_sgp.ops.divergence import beta_div_value

    rng = np.random.default_rng(3)
    den = rng.uniform(1.0, 4.0, 64)
    gn = rng.uniform(1.0, 4.0, 64)
    for b in (0.0, 1.0):
        exact = float(beta_div_value(den, gn, b))
        near = float(beta_div_value(den, gn, b + 1e-7))
        assert exact == pytest.approx(near, rel=1e-5)
    # KL at beta=1 equals the closed form sum(gn*log(gn/den) - gn + den)
    kl = float(np.sum(gn * np.log(gn / den) - gn + den))
    assert float(beta_div_value(den, gn, 1.0)) == pytest.approx(kl, rel=1e-12)


def test_lr_schedule():
    # reference lr_schedule (sgp.py:502-503): init_lr * exp(-k*epoch)
    from tpu_sgp.ops.divergence import lr_schedule

    assert float(lr_schedule(1e-3, 0.1, 0)) == pytest.approx(1e-3)
    assert float(lr_schedule(1e-3, 0.1, 10)) == pytest.approx(1e-3 / np.e)


# --------------------------------------------------------------- operators

def test_good_fft_size():
    from tpu_sgp.ops.psf_operator import _good_fft_size

    for n in [1, 2, 7, 440, 441, 1054, 235]:
        s = _good_fft_size(n)
        assert s >= n and s % 2 == 0
        m = s
        for p in (2, 3, 5, 7):
            while m % p == 0:
                m //= p
        assert m == 1, (n, s)
    assert _good_fft_size(440) == 448    # 2^6 * 7 (not 441 = odd)
    assert _good_fft_size(448) == 448    # already smooth
    assert _good_fft_size(1054) == 1080  # 2^3 * 3^3 * 5


# ------------------------------------------------------------------ reduce

def test_global_reductions_single_device():
    from tpu_sgp.ops.reduce import gsum, gmax, gmean

    x = np.arange(12.0).reshape(3, 4)
    assert float(gsum(x)) == pytest.approx(x.sum())
    assert float(gmax(x)) == pytest.approx(x.max())
    assert float(gmean(x)) == pytest.approx(x.mean())


# --------------------------------------------------------------- api/config

def test_check_psf_normalized():
    # reference sgp.py:97-102: |sum-1| <= 1e4*eps, eps at the PSF's dtype
    from tpu_sgp.api import check_psf_normalized

    psf = np.full((5, 5), 1.0 / 25.0)
    check_psf_normalized(psf)
    check_psf_normalized(psf.astype(np.float32))
    with pytest.raises(ValueError):
        check_psf_normalized(psf * 1.01)


def test_parity_config_preset():
    from tpu_sgp.config import parity_config

    cfg = parity_config()
    assert cfg.dtype == 'float64'
    assert parity_config(max_iter=5).max_iter == 5


# ------------------------------------------------------------------- image

def test_cutout_position_round_trip():
    # astropy Cutout2D.to_original_position/to_cutout_position analogs
    from tpu_sgp.image.cutout import Cutout2D

    data = np.arange(100.0).reshape(10, 10)
    c = Cutout2D(data, position=(5.0, 6.0), size=(5, 5))
    orig = c.to_original_position((2.0, 2.0))
    back = c.to_cutout_position(orig)
    assert back == (2.0, 2.0)
    ox, oy = c.origin_original
    assert orig == (2.0 + ox, 2.0 + oy)


def test_getheader_round_trip(tmp_path):
    from tpu_sgp.image import write_fits
    from tpu_sgp.image.fitsio import getheader

    p = str(tmp_path / 'h.fits')
    write_fits(p, np.zeros((4, 4)), header={'GAIN': 1.22, 'OBJ': 'M13'})
    h = getheader(p)
    assert float(h['GAIN']) == pytest.approx(1.22)
    assert str(h['OBJ']).strip() == 'M13'


def test_match_backgrounds_recovers_offsets():
    # reproject match_background model: additive offsets, mean-zero
    from tpu_sgp.image.mosaic import match_backgrounds

    base = np.random.default_rng(5).uniform(10, 11, (20, 30))
    t1 = base[:, :18].copy() + 2.0
    t2 = base[:, 12:].copy() - 2.0
    off = match_backgrounds([t1, t2], [(0, 0), (12, 0)])
    assert off.sum() == pytest.approx(0.0, abs=1e-9)
    assert off[0] - off[1] == pytest.approx(4.0, abs=1e-6)


def test_pixel_to_skycoord_matches_wcs():
    from tpu_sgp.image.wcs import WCS, pixel_to_skycoord

    w = WCS({'CRPIX1': 5.0, 'CRPIX2': 5.0, 'CRVAL1': 150.0,
             'CRVAL2': 30.0, 'CDELT1': -2.8e-4, 'CDELT2': 2.8e-4})
    ra, dec = pixel_to_skycoord(4.0, 4.0, w)
    assert float(ra) == pytest.approx(150.0, abs=1e-9)
    assert float(dec) == pytest.approx(30.0, abs=1e-9)
    # round trip through the inverse
    x, y = w.world_to_pixel(*pixel_to_skycoord(7.3, 2.1, w))
    assert float(x) == pytest.approx(7.3, abs=1e-6)
    assert float(y) == pytest.approx(2.1, abs=1e-6)


def test_tile_origins():
    from tpu_sgp.image.tiling import create_subdivisions, tile_origins

    img = np.zeros((50, 70))
    tiles = create_subdivisions(img, subdiv_shape=(30, 30), overlap=5)
    org = tile_origins(tiles)
    assert org.shape == (len(tiles), 2)
    assert (org >= 0).all()
    assert {tuple(o) for o in org} == {tuple(t.origin_original)
                                       for t in tiles}


# -------------------------------------------------------------- preprocess

def test_select_biases(tmp_path):
    # Automation.cl rule: biases are EXPTIME == 0 frames
    from tpu_sgp.image import write_fits
    from tpu_sgp.preprocess import select_biases

    pb = str(tmp_path / 'bias.fits')
    ps = str(tmp_path / 'sci.fits')
    write_fits(pb, np.zeros((4, 4)), header={'EXPTIME': 0.0})
    write_fits(ps, np.zeros((4, 4)), header={'EXPTIME': 30.0})
    assert select_biases([pb, ps, str(tmp_path / 'missing.fits')]) == [pb]


# --------------------------------------------------------------- psf stars

def test_select_psf_stars_filters_and_orders():
    from tpu_sgp.psf.pipeline import select_psf_stars

    img = np.zeros((100, 100))
    stars = np.array(
        [(50.0, 50.0, 5000.0, 40.0, 0),    # good, brightest
         (20.0, 20.0, 1000.0, 40.0, 0),    # good
         (80.0, 20.0, 3000.0, 40.0, 1),    # saturated -> dropped
         (5.0, 50.0, 2000.0, 40.0, 0),     # too close to edge (hw=15)
         (80.0, 80.0, 50.0, 40.0, 0),      # below min_flux
         (48.0, 52.0, 4000.0, 40.0, 0)],   # blended pair with the first:
        dtype=[('x', 'f8'), ('y', 'f8'), ('approx_flux', 'f8'),  # both out
               ('local_bkg_level', 'f8'),
               ('num_saturated_pixels_in_aperture', 'i8')])
    sel = select_psf_stars(img, stars, hw=15, min_flux=100.0)
    # the (50,50)/(48,52) pair mutually contaminate (neighbor > 20% flux
    # inside min_sep=2*hw); only the isolated (20,20) star survives
    assert list(sel['approx_flux']) == [1000.0]
    # with the blend partner removed, brightest-first ordering shows
    sel2 = select_psf_stars(img, stars[np.arange(len(stars)) != 5],
                            hw=15, min_flux=100.0)
    assert list(sel2['approx_flux']) == [5000.0, 1000.0]


# ---------------------------------------------------------------- plotting

def test_plot_positions_smoke():
    from tpu_sgp.catalog import source_info
    from tpu_sgp.catalog.plotting import plot_positions

    rng = np.random.default_rng(11)
    img = rng.normal(100.0, 3.0, (64, 64))
    yy, xx = np.mgrid[:64, :64]
    for cx, cy in [(20, 20), (44, 30)]:
        img += 300.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 4.0)
    scat, bkg = source_info(img, box_size=(16, 16))
    fig = plot_positions(img - bkg.background, scat.to_table())
    assert fig is not None
    import matplotlib.pyplot as plt
    plt.close(fig)


# --------------------------------------------------------------------- cli

def test_cli_build_parser_defaults(capsys):
    from tpu_sgp.cli import build_parser, print_options

    p = build_parser()
    args = p.parse_args(['--data_path_sciimg', 'x.fits',
                         '--data_path_psf', 'p.fits'])
    # reference defaults (sgp.py:922-923)
    assert args.subdivision_size == 100
    assert args.subdiv_overlap == 10
    assert not args.use_beta_div
    print_options(args)
    out = capsys.readouterr().out
    assert 'data_path_sciimg' in out and 'x.fits' in out


def test_jax_platforms_env_wins_over_plugin_override():
    """Importing tpu_sgp with JAX_PLATFORMS=cpu must force the cpu backend
    even when a plugin register hook pre-set jax_platforms to its own list
    (during a backend outage the hook's preferred platform hangs), and
    must NOT enable the persistent compile cache for the cpu run. With the
    env allowing the hook's preference, the hook's list is left alone."""
    import os
    import subprocess
    import sys

    prog_cpu = (
        "import tpu_sgp, jax\n"
        "assert jax.config.jax_platforms == 'cpu', jax.config.jax_platforms\n"
        "assert not jax.config.jax_compilation_cache_dir\n"
        "print(jax.devices()[0].platform)\n"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ('TPU_SGP_NO_COMPILE_CACHE',)}
    env['JAX_PLATFORMS'] = 'cpu'
    r = subprocess.run([sys.executable, '-c', prog_cpu], cwd='/root/repo',
                       capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip().endswith('cpu')


def test_jax_platforms_env_order_decides_default_platform():
    """The env var's FIRST platform is the user's default: a hook override
    that reorders it (env 'cpu,X' vs hook 'X,cpu') must be replaced by the
    env list, while a hook that merely appends a fallback behind the env's
    own first choice (env 'X' vs hook 'X,cpu') is left alone. Config-only
    (no backend is initialized), so the fake platform name is safe."""
    import os
    import subprocess
    import sys

    prog = (
        "import os, jax\n"
        "jax.config.update('jax_platforms', 'fakeplat,cpu')  # hook override\n"
        "import tpu_sgp\n"
        "assert jax.config.jax_platforms == 'cpu,fakeplat', \\\n"
        "    jax.config.jax_platforms\n"
        "tpu_sgp._os.environ['JAX_PLATFORMS'] = 'fakeplat'\n"
        "jax.config.update('jax_platforms', 'fakeplat,cpu')\n"
        "tpu_sgp._mirror_platforms_env()\n"
        "assert jax.config.jax_platforms == 'fakeplat,cpu', \\\n"
        "    jax.config.jax_platforms\n"
        "print('ok')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS='cpu,fakeplat')
    r = subprocess.run([sys.executable, '-c', prog], cwd='/root/repo',
                       capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip().endswith('ok')


def test_bench_backend_probe_fails_cleanly_on_bad_platform():
    """bench.py's outage guard: with an impossible platform the probe must
    return False within its budget instead of hanging."""
    import importlib.util
    import os
    import time

    spec = importlib.util.spec_from_file_location(
        'benchmod', os.path.join('/root/repo', 'bench.py'))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    old = os.environ.get('JAX_PLATFORMS')
    os.environ['JAX_PLATFORMS'] = 'no_such_platform'
    try:
        t0 = time.monotonic()
        assert m._wait_for_backend(max_wait_s=8) is False
        assert time.monotonic() - t0 < 60
    finally:
        if old is None:
            os.environ.pop('JAX_PLATFORMS', None)
        else:
            os.environ['JAX_PLATFORMS'] = old


def test_bench_cpu_fallback_relabels_and_shrinks():
    """When the probe budget is exhausted bench.py must NOT silently skip:
    it drops to a reduced-size CPU run whose metric keys say so. The helper
    must force the cpu platform (env var, pre-jax-import), relabel the
    metric suffix, disable the TPU-sized compaction, and shrink every
    batch/repeat knob (a TPU-sized batch would run for hours on one host
    core)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        'benchmod_fb', os.path.join('/root/repo', 'bench.py'))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    old = os.environ.get('JAX_PLATFORMS')
    try:
        m._enter_cpu_fallback()
        assert os.environ['JAX_PLATFORMS'] == 'cpu'
        assert m.SUFFIX == 'cpu_fallback'
        assert m.COMPACT is False
        assert m.BATCH < 1024 and m.BETA_BATCH <= m.BATCH
        assert m.N_REPEATS <= 5
        assert m.SERVE_CALLS < 25 and m.STREAM_REQ < 16
    finally:
        if old is None:
            os.environ.pop('JAX_PLATFORMS', None)
        else:
            os.environ['JAX_PLATFORMS'] = old


def test_sgpconfig_rejects_invalid_fields():
    """__post_init__ validation: every enum-like field names its legal
    values instead of failing later inside a jitted trace."""
    import pytest

    from tpu_sgp import SGPConfig

    for kw in (dict(divergence='poisson'), dict(operator='conv'),
               dict(projection_method='newton'), dict(stop_criterion=5),
               dict(init_recon=4), dict(proj_type=2), dict(max_iter=0),
               dict(bt_factor=1.0), dict(bt_factor=0.0),
               # cap binds before the 1e-12 rescue floor: a capped exit
               # would adopt a step that failed the Armijo test
               dict(bt_factor=0.9)):
        with pytest.raises(ValueError):
            SGPConfig(**kw)
    # a cap deep enough to reach the floor is fine; 0 = line search off
    SGPConfig(bt_factor=0.9, max_backtracks=300)
    SGPConfig(max_backtracks=0)


def test_beta_div_special_rejects_generic_beta():
    """beta_div_special implements only the exact beta in {0,1} reference
    branches (sgp.py:452-455); any other beta must be refused, not
    silently approximated."""
    import numpy as np
    import pytest

    from tpu_sgp.ops.divergence import beta_div_special

    den = np.full((4, 4), 2.0)
    gn = np.full((4, 4), 3.0)
    with pytest.raises(ValueError):
        beta_div_special(den, gn, 0.5)


def test_sgp_errflag_requires_ground_truth():
    """Reference parity: err tracking needs obj (the reference would
    silently emit an all-inf err series; here it's an explicit error)."""
    import pytest

    from tpu_sgp import sgp

    gn = np.full((8, 8), 10.0)
    psf = np.full((8, 8), 1.0 / 64.0)
    with pytest.raises(ValueError, match='errflag'):
        sgp(gn, psf, 1.0, errflag=True, MAXIT=2)


def test_cli_comparison_plot(tmp_path, monkeypatch):
    """--plot writes the reference's side-by-side comparison figure
    (sgp.py:1216-1234 analog) as sgp_comparison.png in the cwd."""
    import os

    from tpu_sgp.cli import _comparison_plot

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    img = rng.uniform(10.0, 100.0, (32, 32))
    _comparison_plot(img, img * 0.5)
    assert os.path.exists(tmp_path / 'sgp_comparison.png')
    assert os.path.getsize(tmp_path / 'sgp_comparison.png') > 1000


def test_plot_positions_sep_style_dict():
    """The reference passed sep's output (keys x/y/a/b/theta, theta in
    RADIANS, utils.py:293-310); the fallback column path must convert the
    angle to the degrees matplotlib Ellipse expects."""
    import matplotlib.pyplot as plt

    from tpu_sgp.catalog.plotting import plot_positions

    rng = np.random.default_rng(1)
    img = rng.normal(0.0, 1.0, (32, 32))
    objs = {'x': np.array([10.0, 20.0]), 'y': np.array([12.0, 8.0]),
            'a': np.array([2.0, 1.5]), 'b': np.array([1.0, 1.2]),
            'theta': np.array([np.pi / 4, 0.0])}
    fig = plot_positions(img, objs)
    ellipses = [a for a in fig.axes[0].get_children()
                if type(a).__name__ == 'Ellipse']
    assert len(ellipses) == 2
    assert ellipses[0].angle == pytest.approx(45.0)
    plt.close(fig)


def test_wcs_linear_ctype_round_trip():
    """Non-TAN CTYPEs fall back to linear world coordinates — pixel and
    world offsets then relate through the CD matrix alone."""
    from tpu_sgp.image.wcs import WCS

    w = WCS({'CRPIX1': 3.0, 'CRPIX2': 4.0, 'CRVAL1': 100.0,
             'CRVAL2': 5.0, 'CDELT1': 0.5, 'CDELT2': 0.25,
             'CTYPE1': 'LINEAR', 'CTYPE2': 'LINEAR'})
    ra, dec = w.pixel_to_world(6.0, 8.0)
    assert float(ra) == pytest.approx(100.0 + 0.5 * (6.0 - 2.0))
    assert float(dec) == pytest.approx(5.0 + 0.25 * (8.0 - 3.0))
    x, y = w.world_to_pixel(ra, dec)
    assert float(x) == pytest.approx(6.0, abs=1e-9)
    assert float(y) == pytest.approx(8.0, abs=1e-9)


def test_api_doc_symbols_resolve():
    """Every dotted tpu_sgp.* reference in docs/API.md resolves to a real
    module or attribute — the API doc cannot drift from the package."""
    import importlib
    import os
    import re

    doc = os.path.join(os.path.dirname(__file__), '..', 'docs', 'API.md')
    with open(doc) as f:
        names = set(re.findall(r'\btpu_sgp(?:\.[A-Za-z_][A-Za-z0-9_]*)+',
                               f.read()))
    assert len(names) >= 15
    for name in sorted(names):
        parts = name.split('.')
        obj = importlib.import_module(parts[0])
        for i, attr in enumerate(parts[1:], start=1):
            try:
                obj = getattr(obj, attr)
            except AttributeError:
                try:
                    obj = importlib.import_module('.'.join(parts[:i + 1]))
                except ImportError:
                    raise AssertionError(
                        f'docs/API.md references {name}, but '
                        f'{".".join(parts[:i + 1])} does not resolve')


def test_console_script_entry_points_resolve():
    """Every [project.scripts] target in pyproject.toml imports and is
    callable (the installed console scripts cannot drift from the code)."""
    import importlib
    import os
    import re

    pyproject = os.path.join(os.path.dirname(__file__), '..',
                             'pyproject.toml')
    with open(pyproject) as f:
        text = f.read()
    block = re.search(r'\[project\.scripts\]\n(.*?)(?:\n\[|\Z)', text,
                      re.DOTALL).group(1)
    entries = re.findall(r'^([\w-]+)\s*=\s*"([\w.]+):(\w+)"', block,
                         re.MULTILINE)
    assert len(entries) == 6
    for script, module, attr in entries:
        fn = getattr(importlib.import_module(module), attr)
        assert callable(fn), script


def test_degenerate_solver_inputs_raise_loudly():
    """api.sgp rejects inputs the compiled core would turn into silent
    NaNs (the reference dies on the same inputs with a cryptic zero-size
    reduction from inside projectDF / the null-pixel floor)."""
    from tpu_sgp import sgp
    yy, xx = np.mgrid[:16, :16] - 8.0
    psf = np.exp(-(xx ** 2 + yy ** 2) / 6.0)
    psf /= psf.sum()
    img = 100.0 + 40.0 * psf * psf.size

    bad = img.copy()
    bad[3, 4] = np.nan
    with pytest.raises(ValueError, match='non-finite pixels'):
        sgp(bad, psf, 100.0, MAXIT=3)
    bad[3, 4] = np.inf
    with pytest.raises(ValueError, match='non-finite pixels'):
        sgp(bad, psf, 100.0, MAXIT=3)
    with pytest.raises(ValueError, match='identically zero'):
        sgp(np.zeros_like(img), psf, 0.0, MAXIT=3)
    with pytest.raises(ValueError, match='non-finite values'):
        sgp(img, psf, np.nan, MAXIT=3)
    for f in (0.0, -100.0):
        with pytest.raises(ValueError, match='positive total flux'):
            sgp(img, psf, 100.0, proj_type=1, flux=f, MAXIT=3,
                ccd_sat_level=65000.0)
    # flux=None resolves to sum(gn - bkg): negative here -> same rejection
    with pytest.raises(ValueError, match='sum\\(gn - bkg\\)'):
        sgp(img, psf, 1e6, proj_type=1, MAXIT=3, ccd_sat_level=65000.0)
    # a NaN PSF must not slide through the normalization check
    nan_psf = psf.copy()
    nan_psf[0, 0] = np.nan
    with pytest.raises(ValueError, match='not normalized'):
        sgp(img, nan_psf, 100.0, MAXIT=3)
    # beta wrapper shares the validation
    from tpu_sgp import sgp_beta_div
    with pytest.raises(ValueError, match='non-finite pixels'):
        sgp_beta_div(bad, psf, 100.0, MAXIT=3)
