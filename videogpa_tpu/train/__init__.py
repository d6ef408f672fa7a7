"""DPO post-training: preference pairs, loss, LoRA, pjit trainer."""

from videogpa_tpu.train.loss import DPOLoss, LossOutput, SFTLoss, create_loss_strategy
from videogpa_tpu.train.lora import (
    lora_init,
    merge_lora,
    export_peft,
    import_peft,
)
from videogpa_tpu.train.dataset import DPODataset, collate

__all__ = [
    "DPOLoss",
    "SFTLoss",
    "LossOutput",
    "create_loss_strategy",
    "lora_init",
    "merge_lora",
    "export_peft",
    "import_peft",
    "DPODataset",
    "collate",
]
