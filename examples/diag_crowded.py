"""Characterize the crowded-field catalog deviation vs the paper.

Historical: round 2 detected 480 sources vs the paper's 392; round 3
closed that to 409 (+4.3%) by matching photutils' masked-pad/IDW
background, pixel-integrated kernel, legacy zoom mapping, and tree
deblender exactly. This script reports the current mismatch structure.

Matches our catalog against the paper's bundled photutils catalog
(/root/reference/results/CROWDED_SUBDIV_ORIGCAT.csv) and characterizes the
unmatched sources: are they faint near-threshold detections (=> threshold/RMS
bias) or splits of matched sources (=> deblending bias)?
"""
import csv
import sys

import numpy as np

sys.path.insert(0, '/root/repo')
from tpu_sgp.catalog import source_info
from tpu_sgp.image import read_fits


def load_paper(path):
    rows = []
    with open(path) as f:
        for r in csv.DictReader(f):
            rows.append(r)
    return rows


def main():
    img = read_fits('/root/reference/results/CROWDED_SUBDIV_ORIGIMG.fits')
    if isinstance(img, tuple):
        img = img[0]
    img = np.asarray(img, np.float64)
    print('image', img.shape, 'min/max', img.min(), img.max())
    scat, bkg = source_info(img, box_size=(60, 60), n_pixels=5,
                            sigma_threshold=1.5)
    n_ours = len(scat)
    scat = scat.to_table().to_pandas()
    paper = load_paper('/root/reference/results/CROWDED_SUBDIV_ORIGCAT.csv')
    print(f'ours={n_ours} paper={len(paper)}')

    ox = scat['xcentroid'].to_numpy()
    oy = scat['ycentroid'].to_numpy()
    oarea = scat['area'].to_numpy()
    omax = scat['max_value'].to_numpy()
    px = np.array([float(r['xcentroid']) for r in paper])
    py = np.array([float(r['ycentroid']) for r in paper])
    parea = np.array([float(r['area']) for r in paper])
    pmax = np.array([float(r['max_value']) for r in paper])

    # nearest-neighbor match ours->paper within 2 px
    d2 = (ox[:, None] - px[None, :]) ** 2 + (oy[:, None] - py[None, :]) ** 2
    nn = d2.argmin(axis=1)
    nnd = np.sqrt(d2[np.arange(n_ours), nn])
    matched = nnd < 2.0
    print(f'ours matched to paper (<2px): {matched.sum()} / {n_ours}')
    # paper->ours
    nnp = d2.argmin(axis=0)
    nndp = np.sqrt(d2[nnp, np.arange(len(paper))])
    print(f'paper matched by ours (<2px): {(nndp < 2.0).sum()} / {len(paper)}')

    # how many of our sources map to the same paper source (splits)?
    m_idx = nn[matched]
    uniq, cnt = np.unique(m_idx, return_counts=True)
    print(f'paper sources claimed by >1 of ours: {(cnt > 1).sum()} '
          f'(extra rows from splits: {(cnt - 1).sum()})')

    un = ~matched
    print(f'\nUNMATCHED ours: {un.sum()}')
    print('  area  quartiles:', np.percentile(oarea[un], [25, 50, 75]))
    print('  maxv  quartiles:', np.percentile(omax[un], [25, 50, 75]))
    print('  matched area q:', np.percentile(oarea[matched], [25, 50, 75]))
    print('  paper  area  q:', np.percentile(parea, [25, 50, 75]))
    print('  paper  maxv  q:', np.percentile(pmax, [25, 50, 75]))

    # matched-pair area comparison: systematic threshold bias shows up as
    # our areas > paper areas for the same stars
    pa = parea[nn[matched]]
    oa = oarea[matched]
    rel = (oa - pa) / np.maximum(pa, 1)
    print(f'\nmatched-pair area rel diff: med={np.median(rel):.3f} '
          f'mean={rel.mean():.3f}  (ours bigger if >0)')
    same = (oa == pa).mean()
    print(f'matched pairs with EXACT same area: {same:.2%}')

    # threshold statistics
    thr = 1.5 * bkg.background_rms
    print(f'\nthreshold map: med={np.median(thr):.2f} '
          f'p10={np.percentile(thr, 10):.2f} p90={np.percentile(thr, 90):.2f}')
    print(f'rms mesh med={np.median(bkg.background_rms_mesh):.3f}')
    print(f'bkg med={bkg.background_median:.2f}')

    # where are the unmatched? clustered in the (crowded) core?
    yy = oy[un]
    xx = ox[un]
    print(f'\nunmatched centroid spread: x[{xx.min():.0f},{xx.max():.0f}] '
          f'y[{yy.min():.0f},{yy.max():.0f}]')
    # local image level at unmatched positions (star-covered or sky?)
    lev = img[np.clip(yy.astype(int), 0, img.shape[0] - 1),
              np.clip(xx.astype(int), 0, img.shape[1] - 1)]
    print('image level at unmatched:', np.percentile(lev, [25, 50, 75]))
    print('image global median:', np.median(img))


if __name__ == '__main__':
    main()
