from clipper_tpu.solvers.msrc import find_dense_clique, round_solution, solve_msrc

__all__ = ["find_dense_clique", "round_solution", "solve_msrc"]
