from .batch import beta_init_search, restore_stamps
from .distributed import (make_batch_image_mesh, make_image_mesh,
                          solve_distributed, solve_distributed_batch)
from .multiprocess import (global_device_grid, init_distributed,
                           make_multiprocess_mesh)
from .session import RestorationSession

__all__ = ['restore_stamps', 'beta_init_search', 'make_image_mesh',
           'make_batch_image_mesh', 'solve_distributed',
           'solve_distributed_batch', 'RestorationSession',
           'init_distributed', 'global_device_grid',
           'make_multiprocess_mesh']
