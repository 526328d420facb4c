"""Driver-side planning functions and pure-numpy kernel builders.

These run on the driver to fold plan constants (scales→frame bounds,
sigmas, kernel weight stacks, Sx line offsets) before any Spark job is
launched — the engine's analog of the reference's plan-constant folding
step (reference topo.py:127-128, 832-853).
"""
