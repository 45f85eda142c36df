"""Ray-Data-native layout/main-content extraction engine (see SURVEY.md)."""
