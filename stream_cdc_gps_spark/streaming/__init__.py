"""Structured Streaming layer: the reference's CDC/GPS dataflows re-expressed
as pure DataFrame transforms (transforms.py) wired into checkpointed
streaming graphs (pipeline.py)."""
