"""Interactive application layer: viewer, camera controller, scene config I/O."""
