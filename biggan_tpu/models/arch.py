"""Architecture table — one parameterized spec per resolution.

The reference ships three ~90% copy-pasted files (``BigGAN_128.py``,
``BigGAN_256.py``, ``BigGAN_512.py``; SURVEY.md §1) differing only in stack
depth and z-split arithmetic. Here the per-resolution differences are data:

- ``g_ch_mults`` — output channel multiplier (×``ch``) of each up block;
  the initial 4×4 seed tensor uses ``g_ch_mults_seed``·ch channels.
- ``attn_res`` — feature-map resolution at which SAGAN attention is
  inserted in both G and D (the reference keeps it at 64×64 for 128/256/512,
  SURVEY §3.3; 32×32 for the 64px model; none for 32px per BASELINE config 1).
- D mirrors G: ``d_ch_mults`` are the down-block output multipliers, then a
  final no-resize ResBlock (ref ``BigGAN_128.discriminator``, :~115-150).

z is split into ``len(g_ch_mults)+1`` chunks (first feeds the seed FC, one
per up block for cBN; ref ``BigGAN_128.generator`` z-split, :~68-78).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ArchSpec:
    img_size: int
    seed_size: int  # spatial size of the FC-projected seed tensor (always 4)
    g_seed_mult: int  # channel mult of the 4×4 seed
    g_ch_mults: Tuple[int, ...]  # per up-block output channel mult
    d_ch_mults: Tuple[int, ...]  # per down-block output channel mult
    attn_res: Optional[int]  # feature-map resolution for self-attention

    @property
    def num_z_chunks(self) -> int:
        return len(self.g_ch_mults) + 1

    def validate(self) -> None:
        size = self.seed_size * (2 ** len(self.g_ch_mults))
        if size != self.img_size:
            raise ValueError(
                f"arch for img_size={self.img_size}: {len(self.g_ch_mults)} up "
                f"blocks from {self.seed_size} reach {size}, not {self.img_size}"
            )


ARCH_TABLE = {
    # BigGAN-32 (CIFAR-10; BASELINE config 1: ch=64, no self-attention)
    32: ArchSpec(32, 4, 4, (4, 4, 4), (4, 4, 4), None),
    # BigGAN-64 (SAGAN-scale; attention at 32×32)
    64: ArchSpec(64, 4, 16, (8, 4, 2, 1), (1, 2, 4, 8), 32),
    # BigGAN-128 (paper table; attention at 64×64, ref BigGAN_128.py)
    128: ArchSpec(128, 4, 16, (16, 8, 4, 2, 1), (1, 2, 4, 8, 16), 64),
    # BigGAN-256 (one more stage, z → 7 chunks; ref BigGAN_256.py)
    256: ArchSpec(256, 4, 16, (16, 8, 8, 4, 2, 1), (1, 2, 4, 8, 8, 16), 64),
    # BigGAN-512 (ref BigGAN_512.py; attention stays at 64×64)
    512: ArchSpec(512, 4, 16, (16, 8, 8, 4, 2, 1, 1), (1, 1, 2, 4, 8, 8, 16), 64),
}

for _spec in ARCH_TABLE.values():
    _spec.validate()


def get_arch(img_size: int) -> ArchSpec:
    try:
        return ARCH_TABLE[img_size]
    except KeyError:
        raise ValueError(
            f"unsupported img_size {img_size}; supported: {sorted(ARCH_TABLE)}"
        ) from None
