"""helping_hand_for_egocentric_videos_tpu — TPU-native Helping Hands.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the ICCV
2023 "Helping Hands: An Object-Aware Ego-Centric Video Recognition Model"
reference codebase (Chuhanxx/helping_hand_for_egocentric_videos), redesigned
TPU-first:

- ``models``   frozen LaviLa backbone (TimeSformer-L divided space-time
               attention + CLIP text tower) and the trainable DETR-style
               object decoder, as pure-functional pytrees.
- ``ops``      box math, a batched jittable Hungarian matcher, Pallas
               attention kernels, fused device-side preprocessing.
- ``losses``   EgoNCE (multi-positive), DETR set criterion, word-level
               contrastive loss — all fixed-shape / mask-based.
- ``parallel`` mesh construction and sharding rules (pjit/shard_map over
               ICI; XLA collectives instead of NCCL).
- ``data``     host-side pipeline: C++ decode stage, frame samplers,
               EgoClip/EgoMCQ, Epic-Kitchens MIR, EGTEA datasets, CLIP BPE
               tokenizer.
- ``metrics``  EgoMCQ accuracy, retrieval R@k, nDCG, mAP, class accuracy.
- ``train``    pretraining loop and eval harnesses.
"""

__version__ = "0.2.0"
