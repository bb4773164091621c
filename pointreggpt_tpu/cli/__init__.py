"""Command-line entry points (the reference's six top-level scripts,
README.md:96-160, plus the checkpoint importer and the depth-correction
data builder).

Installed wheels expose them as console scripts (``prgpt-*``, see
pyproject ``[project.scripts]``); a repo checkout also keeps the
reference-shaped ``cli/*.py`` wrappers so ``python cli/<name>.py`` works
unchanged.
"""
