"""Analysis & reporting layer (reference analysis/ + scripts/analyze_*)."""
