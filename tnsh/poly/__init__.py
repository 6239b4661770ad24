"""tnsh subpackage."""
