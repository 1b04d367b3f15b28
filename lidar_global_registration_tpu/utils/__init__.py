"""Config, IO, artifact naming, CSV logs (host-side runtime)."""
