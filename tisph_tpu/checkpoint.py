"""Full-state checkpoint / resume.

The reference cannot restart a run: its only export (``dump()``,
partice_systemv4.py:279-296) drops density/pressure/volume (SURVEY.md §5.4).
Here the complete SimState pytree round-trips:

- ``save_npz`` / ``load_npz``: single-file numpy archive (portable,
  dependency-free);
- ``save_orbax`` / ``load_orbax``: orbax-checkpoint directory format (for
  async, sharded, or cloud-storage checkpoints), gated on orbax being
  importable.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from tisph_tpu.models.state import SimState


def save_npz(state: SimState, path: str | os.PathLike, rigid=None) -> None:
    """``rigid``: optional RigidState — dynamic-body momentum (v_com,
    omega) is NOT derivable from the particle snapshot (make_rigid_state
    zero-initialises it), so rigid scenes must checkpoint it alongside."""
    host = {k: np.asarray(v) for k, v in jax.device_get(dataclasses.asdict(state)).items()}
    if rigid is not None:
        host.update({
            f"rigid__{k}": np.asarray(v)
            for k, v in jax.device_get(dataclasses.asdict(rigid)).items()
        })
    np.savez_compressed(os.fspath(path), **host)


def load_npz(path: str | os.PathLike, with_rigid: bool = False):
    """Returns the SimState, or ``(SimState, RigidState | None)`` when
    ``with_rigid`` (None if the archive carries no rigid fields)."""
    with np.load(os.fspath(path)) as z:
        fields = {k: jnp.asarray(z[k]) for k in z.files
                  if not k.startswith("rigid__")}
        rfields = {k[len("rigid__"):]: jnp.asarray(z[k]) for k in z.files
                   if k.startswith("rigid__")}
    state = SimState(**fields)
    if not with_rigid:
        return state
    if not rfields:
        return state, None
    from tisph_tpu.models.rigid import RigidState

    return state, RigidState(**rfields)


def save_orbax(state: SimState, path: str | os.PathLike) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(os.fspath(path)), state)


def load_orbax(path: str | os.PathLike, like: SimState) -> SimState:
    """Restore; ``like`` provides the pytree structure/shapes."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(os.fspath(path)), like)
