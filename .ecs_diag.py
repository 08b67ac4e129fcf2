import faulthandler, sys
faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)
exec(open('/root/repo/bench.py').read())
