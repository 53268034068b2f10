#!/bin/bash
# Kaldi-style option parsing (same contract as the reference driver's
# utils/parse_options.sh): any "--variable-name value" pair on the command
# line overwrites the shell variable "variable_name", which must already
# be defined in the calling script. This is an independent implementation
# of the standard pattern, extended so options may appear before OR after
# the positional args (classic Kaldi stops at the first positional, which
# silently ignores trailing overrides); positionals are re-assigned to
# $1..$N. Must be sourced, not executed.

_positionals=()
while [ $# -gt 0 ]; do
  case "$1" in
    --*=*)
      echo "parse_options: options must be given as --name value, got '$1'" 1>&2
      return 1 2>/dev/null || exit 1 ;;
    --*)
      _name=$(echo "$1" | sed s/^--// | sed s/-/_/g)
      if eval '[ -z "${'$_name'+xxx}" ]'; then
        echo "parse_options: invalid option $1" 1>&2
        return 1 2>/dev/null || exit 1
      fi
      if [ $# -lt 2 ]; then
        echo "parse_options: missing value for option $1" 1>&2
        return 1 2>/dev/null || exit 1
      fi
      eval $_name=\"\$2\"
      shift 2 ;;
    *)
      _positionals+=("$1")
      shift ;;
  esac
done
set -- "${_positionals[@]}"
unset _positionals _name
true
