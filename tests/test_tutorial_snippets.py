"""docs/TUTORIAL.md stays honest: every ```python block runs as written.

The blocks execute in order in ONE shared namespace (the tutorial is a
single narrative). Problem sizes are shrunk by patching the synthetic-data
constructors — the tutorial CODE is executed verbatim, only the data is
smaller, so any API drift (renamed kwargs, moved symbols, changed returns)
fails this test.
"""
import os
import re
import shutil

import numpy as np
import pytest

TUTORIAL = os.path.join(os.path.dirname(__file__), '..', 'docs',
                        'TUTORIAL.md')
REF_TXT = '/root/reference/psf/psfccfbrd210048_1_1.bin.txt'


def _python_blocks(text):
    return re.findall(r'```python\n(.*?)```', text, re.DOTALL)


def test_tutorial_python_blocks_run(tmp_path, monkeypatch):
    with open(TUTORIAL) as f:
        blocks = _python_blocks(f.read())
    assert len(blocks) >= 5

    import tpu_sgp.simulate as simulate
    real_stamps, real_field = (simulate.synthetic_star_stamps,
                               simulate.synthetic_star_field)

    def small_stamps(n, *a, **kw):
        return real_stamps(min(n, 64), *a, **kw)

    def small_field(h, w, n_stars=200, **kw):
        return real_field(min(h, 128), min(w, 128),
                          n_stars=min(n_stars, 20), **kw)

    monkeypatch.setattr(simulate, 'synthetic_star_stamps', small_stamps)
    monkeypatch.setattr(simulate, 'synthetic_star_field', small_field)

    # section 6 reads a DIAPL coefficient file by bare name; section 8
    # writes ckpt.npz to the cwd
    monkeypatch.chdir(tmp_path)
    if os.path.exists(REF_TXT):
        shutil.copy(REF_TXT, tmp_path / os.path.basename(REF_TXT))
    else:  # pragma: no cover - reference not mounted
        pytest.skip('reference PSF coefficient file not mounted')

    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f'<tutorial block {i}>', 'exec'), ns)
        except Exception as exc:  # pragma: no cover - failure reporting
            raise AssertionError(
                f'tutorial block {i} failed: {exc}\n---\n{block}') from exc

    # the narrative really solved things along the way
    assert int(ns['res'].iters) > 0            # section 8 solve_with_state
    assert np.asarray(ns['res2'].x).shape == ns['gn'].shape
    np.testing.assert_array_equal(np.asarray(ns['res2'].x),
                                  np.asarray(ns['res'].x))
    assert (tmp_path / 'ckpt.npz').exists()
    assert len(ns['table']) >= 1               # section 6 catalog
    assert ns['psf_mat'].shape == (31, 31)
