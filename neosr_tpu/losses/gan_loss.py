"""GAN loss (bce / mse / huber against real/fake label tensors).

Behavioral parity with /root/reference/neosr/losses/gan_loss.py:6-82,
including loss_weight applying to the generator only.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import optax

from neosr_tpu.losses.basic_loss import huber_loss
from neosr_tpu.utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register()
@dataclass
class gan_loss:
    gan_type: str = "bce"
    real_label_val: float = 1.0
    fake_label_val: float = 0.0
    loss_weight: float = 0.1

    def __post_init__(self) -> None:
        if self.gan_type not in {"bce", "mse", "huber"}:
            msg = f"GAN type {self.gan_type} is not implemented."
            raise NotImplementedError(msg)

    def __call__(
        self, net_output: jnp.ndarray, target_is_real: bool, is_disc: bool = False
    ) -> jnp.ndarray:
        net_output = net_output.astype(jnp.float32)
        target_val = self.real_label_val if target_is_real else self.fake_label_val
        target = jnp.full_like(net_output, target_val)
        if self.gan_type == "bce":
            loss = optax.sigmoid_binary_cross_entropy(net_output, target).mean()
        elif self.gan_type == "mse":
            loss = jnp.mean((net_output - target) ** 2)
        else:
            loss = huber_loss(net_output, target)
        return loss if is_disc else loss * self.loss_weight
