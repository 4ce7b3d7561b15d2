from .diapl import PSF, DiaplPSFModel, read_coo
from .fit import FitStar, fit_psf_model
from .kernels import normalize_psf, scale_psf

__all__ = ['PSF', 'DiaplPSFModel', 'read_coo', 'normalize_psf', 'scale_psf',
           'FitStar', 'fit_psf_model']
