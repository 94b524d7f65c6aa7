"""Device-side on-the-fly mixture creation.

Behavioral spec: reference data/waveform_mixers.py:9-92 (SegmentMixer +
dynamic_loudnorm). The reference runs a per-item Python loop on CPU each
step (SURVEY.md hot loop #3); here the whole batch mixes on device inside
the jitted train step:

- partner selection (n + i) % B is a batch roll (jnp.roll);
- energy matching, the [0.02, 50] ratio clamp, integer-dB random gains in
  [lower_db, higher_db], the second loudnorm of the summed noise, and the
  0.9/max declip (applied to BOTH segment and mixture when |mixture| > 1)
  are all vectorized;
- randomness comes from an explicit jax PRNG key (replacing the reference's
  `random.seed(batch_idx)` trick, models/audiosep.py:68-69 — fold the step
  index into the key for the same cross-replica determinism). The random
  *distribution* matches the reference (integer dB draws); the exact python
  RNG stream is not reproduced.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SegmentMixer:
    max_mix_num: int = 2
    lower_db: int = -10
    higher_db: int = 10

    def __call__(self, waveforms: jax.Array, key: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        """waveforms: (B, ..., L) -> (mixtures, segments), same shape."""
        if self.max_mix_num < 2:
            raise ValueError("max_mix_num must be >= 2")
        b = waveforms.shape[0]
        n_partners = self.max_mix_num - 1
        k_mix, k_db, k_db_final = jax.random.split(key, 3)

        x = waveforms.astype(jnp.float32)
        reduce_axes = tuple(range(1, x.ndim))
        energy = jnp.mean(jnp.square(x), axis=reduce_axes)  # (B,)
        ref_energy = jnp.maximum(energy, 1e-10)

        # mix_num ~ U{2..max_mix_num}; partner i (1-based) active iff
        # i <= mix_num - 1
        mix_num = jax.random.randint(k_mix, (b,), 2, self.max_mix_num + 1)
        gains_db = jax.random.randint(
            k_db, (b, n_partners), self.lower_db, self.higher_db + 1
        ).astype(jnp.float32)

        noise = jnp.zeros_like(x)
        for i in range(1, n_partners + 1):
            partner = jnp.roll(x, -i, axis=0)
            partner_energy = jnp.roll(energy, -i, axis=0)
            ratio = jnp.clip(jnp.sqrt(partner_energy / ref_energy), 0.02, 50.0)
            gain = 10.0 ** (gains_db[:, i - 1] / 20.0)
            scale = jnp.where(i <= mix_num - 1, gain / ratio, 0.0)
            noise = noise + partner * scale.reshape((b,) + (1,) * (x.ndim - 1))

        # second loudnorm of the aggregate noise against the segment
        noise_energy = jnp.mean(jnp.square(noise), axis=reduce_axes)
        ratio = jnp.clip(jnp.sqrt(noise_energy / ref_energy), 0.02, 50.0)
        gain = 10.0 ** (jax.random.randint(
            k_db_final, (b,), self.lower_db, self.higher_db + 1
        ).astype(jnp.float32) / 20.0)
        noise = noise * (gain / ratio).reshape((b,) + (1,) * (x.ndim - 1))

        mixture = x + noise

        # declip both segment and mixture by 0.9/max when clipped
        peak = jnp.max(jnp.abs(mixture), axis=reduce_axes)
        rescale = jnp.where(peak > 1.0, 0.9 / peak, 1.0)
        rescale = rescale.reshape((b,) + (1,) * (x.ndim - 1))
        return mixture * rescale, x * rescale
