from .loop import closed_loop_chunk, run_closed_loop
from .policies import make_policy

__all__ = ["closed_loop_chunk", "run_closed_loop", "make_policy"]
