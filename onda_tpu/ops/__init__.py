"""Pure-function numerical ops (jnp / Pallas): losses, metrics, monitors, prototypes."""
