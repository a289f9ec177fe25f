# Model registry is populated lazily to avoid importing the whole zoo on
# package import; submodules register themselves when imported.
