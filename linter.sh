#!/usr/bin/env bash
# Same-named counterpart of Dassl.pytorch/linter.sh (isort/yapf/flake8);
# delegates to this repo's lint runner.
exec bash "$(dirname "$0")/lint.sh" "$@"
