/* Native fast-I/O codec for the TPU LBM engine.
 *
 * Formats final_state.dat / av_vels.dat with the exact printf contracts of
 * the reference writer (d2q9-bgk.c:2978 "%d %d %.12E %.12E %.12E %.12E %d"
 * and :2993 "%d:\t%.12E").  Called from Python via ctypes
 * (advanced_hpc_lbm_tpu/utils/native.py); a 1024x1024 grid is ~1M lines,
 * where C formatting is ~20x faster than the Python fallback.
 *
 * Build: cc -O2 -shared -fPIC -o libfastio.so fastio.c
 */

#include <stdint.h>
#include <stdio.h>

int fastio_write_final_state(const char *path, const int64_t *coords,
                             const double *fields, const int64_t *obs,
                             long n) {
  FILE *fp = fopen(path, "w");
  if (!fp) return 1;
  char buf[1 << 20];
  setvbuf(fp, buf, _IOFBF, sizeof buf);
  for (long i = 0; i < n; i++) {
    if (fprintf(fp, "%d %d %.12E %.12E %.12E %.12E %d\n",
                (int)coords[2 * i], (int)coords[2 * i + 1], fields[4 * i],
                fields[4 * i + 1], fields[4 * i + 2], fields[4 * i + 3],
                (int)obs[i]) < 0) {
      fclose(fp);
      return 2;
    }
  }
  return fclose(fp) ? 3 : 0;
}

/* Parse an obstacle deck of "x y 1" lines into a row-major (ny, nx) byte
 * mask (semantics of d2q9-bgk.c:2843-2857 incl. its validations).
 * Returns the number of parsed lines, or a negative error code:
 *   -1 open failed, -2 malformed line, -3 x out of range, -4 y out of
 *   range, -5 blocked != 1.  Error line number is written to *err_line. */
long fastio_parse_obstacles(const char *path, long nx, long ny,
                            unsigned char *mask, long *err_line) {
  FILE *fp = fopen(path, "r");
  if (!fp) return -1;
  char buf[1 << 16];
  setvbuf(fp, buf, _IOFBF, sizeof buf);
  long count = 0, lineno = 0;
  char line[256];
  while (fgets(line, sizeof line, fp)) {
    lineno++;
    /* a line longer than the buffer would otherwise be split into two
     * bogus parses — treat truncation (no newline, not EOF) as malformed */
    size_t len = 0;
    while (line[len]) len++;
    if (len + 1 == sizeof line && line[len - 1] != '\n' &&
        !(feof(fp) || ferror(fp))) {
      *err_line = lineno;
      fclose(fp);
      return -2;
    }
    /* skip blank lines */
    int only_ws = 1;
    for (const char *p = line; *p; p++)
      if (*p != ' ' && *p != '\t' && *p != '\n' && *p != '\r') { only_ws = 0; break; }
    if (only_ws) continue;
    long x, y, blocked;
    char trail[8];
    int nf = sscanf(line, "%ld %ld %ld %7s", &x, &y, &blocked, trail);
    if (nf != 3) { *err_line = lineno; fclose(fp); return -2; }
    if (x < 0 || x > nx - 1) { *err_line = lineno; fclose(fp); return -3; }
    if (y < 0 || y > ny - 1) { *err_line = lineno; fclose(fp); return -4; }
    if (blocked != 1) { *err_line = lineno; fclose(fp); return -5; }
    mask[y * nx + x] = 1;
    count++;
  }
  fclose(fp);
  return count;
}

int fastio_write_av_vels(const char *path, const double *av, long n) {
  FILE *fp = fopen(path, "w");
  if (!fp) return 1;
  char buf[1 << 20];
  setvbuf(fp, buf, _IOFBF, sizeof buf);
  for (long i = 0; i < n; i++) {
    if (fprintf(fp, "%ld:\t%.12E\n", i, av[i]) < 0) {
      fclose(fp);
      return 2;
    }
  }
  return fclose(fp) ? 3 : 0;
}
