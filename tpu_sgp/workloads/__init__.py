from . import simulation, spatial_psf, star_stamps, subdivisions

__all__ = ['simulation', 'spatial_psf', 'star_stamps', 'subdivisions']
