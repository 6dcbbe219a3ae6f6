"""Multi-stage texture units — the vx_tex(stage, u, v, lod) surface.

The reference exposes VX_TEX_STAGE_COUNT (=2) sampler stages, each with
its own DCR block selected by writing VX_DCR_TEX_STAGE before the
stage-local registers (graphics.h:150-181, VX_types.vh:332-343).  Here a
stage is simply a (TextureState, texel-array) pair; `sample` dispatches
on a *static* stage index (stages are fixed per drawcall, exactly like
the DCR state).
"""
from __future__ import annotations

import dataclasses

from ..core import constants as C
from . import sampler as sampler_mod

STAGE_COUNT = 2          # VX_TEX_STAGE_COUNT


@dataclasses.dataclass(frozen=True)
class TextureUnits:
    """Bound sampler stages (index -> state); texel arrays live beside
    the states but are traced values, passed separately to sample()."""
    states: tuple                    # tuple[TextureState | None, ...]

    def __post_init__(self):
        if len(self.states) > STAGE_COUNT:
            raise ValueError(
                f"{len(self.states)} stages > VX_TEX_STAGE_COUNT "
                f"({STAGE_COUNT})")

    def state(self, stage: int) -> sampler_mod.TextureState:
        st = self.states[stage]
        if st is None:
            raise ValueError(f"stage {stage} not bound")
        return st


def bind(*stage_states) -> TextureUnits:
    """bind(state0, state1, ...) -> TextureUnits (None = unbound slot)."""
    return TextureUnits(states=tuple(stage_states))


def sample(units: TextureUnits, texel_arrays, stage: int, u, v,
           lod: int = 0):
    """vx_tex(stage, u, v, lod) analog: static stage dispatch into the
    shared sampler.  texel_arrays: sequence of traced uint32 arrays, one
    per bound stage."""
    return sampler_mod.sample(units.state(stage), texel_arrays[stage],
                              u, v, lod=lod)
