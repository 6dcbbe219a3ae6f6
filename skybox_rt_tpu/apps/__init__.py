"""Standalone unit applications — the tests/regression/{tex,om,raster}
host+kernel analogs.  Each exercises one fixed-function stage end-to-end
against the reference's checked-in golden images."""
