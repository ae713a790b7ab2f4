"""Perceptual-study GUIs (reference gui/ — Flask there, stdlib http here)."""
