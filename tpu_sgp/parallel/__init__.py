from .batch import beta_init_search, restore_stamps
from .distributed import make_image_mesh, solve_distributed
from .session import RestorationSession

__all__ = ['restore_stamps', 'beta_init_search', 'make_image_mesh',
           'solve_distributed', 'RestorationSession']
