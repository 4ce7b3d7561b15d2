from . import simulation, star_stamps, subdivisions

__all__ = ['simulation', 'star_stamps', 'subdivisions']
