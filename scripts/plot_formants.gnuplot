# Plot `python -m voxtpu analyze file.wav > output.txt` columns
# (time, f1 b1 .. f4 b4, rms, f0), mirroring the reference example's
# plot_formants.gnuplot usage.
set log y2 2
plot 'output.txt' using 1:10 with lines, \
     '' using 1:2 with lines axes x1y2, \
     '' using 1:4 with lines axes x1y2, \
     '' using 1:6 with lines axes x1y2, \
     '' using 1:8 with lines axes x1y2, \
     '' using 1:11 with lines axes x1y2
