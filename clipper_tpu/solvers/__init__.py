from clipper_tpu.solvers.msrc import find_dense_clique, round_solution, solve_msrc
from clipper_tpu.solvers.msrc_flat import flat_solve_single, solve_batched

__all__ = ["find_dense_clique", "round_solution", "solve_msrc",
           "flat_solve_single", "solve_batched"]
