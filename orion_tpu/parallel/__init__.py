from .mesh import build_mesh, encrypted_dp_mp_step, dryrun_multichip

__all__ = ["build_mesh", "encrypted_dp_mp_step", "dryrun_multichip"]
