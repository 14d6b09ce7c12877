"""Test-only torch transcription of the reference custom Mask R-CNN.

Used exclusively by the parity harness (tests/test_parity_torch.py) and
the measured CPU baseline in bench.py. This is an independent
re-expression of the reference's training semantics in plain torch (no
torchvision), written against /root/reference/src — NOT a copy of it.
"""
