"""Entry-point applications (CLI equivalents of the reference's L5 layer)."""
