"""Column-function surface: AI functions (ai_generate / ai_classify /
ai_complete) and Dremio-dialect scalar shims."""
