"""The single shared training engine (the reference duplicates its train
loop in every model class; here there is exactly one, SURVEY.md §7 step 6)."""
