"""Differentiable rendering: gradients from pixels to scene parameters.

New capability with no reference equivalent (the Rust tracer is forward
only).  Discrete decisions (closest-hit selection, shadow binarity,
hemisphere directions) are detached; the continuous shading/geometry
terms differentiate analytically through the jnp pipeline.
"""
